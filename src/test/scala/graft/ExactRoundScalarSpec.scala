package graft

import org.scalatest.funspec.AnyFunSpec

import graft.functions.ExactRound

/** The driver-side scalar images of Catalyst `round(double, 8)`
  * ([[ExactRound.scaled8]] / [[ExactRound.fold8]]) carry a fast
  * floor-based path with a BigDecimal fallback inside guard bands —
  * this spec pins BIT-IDENTITY with the BigDecimal reference (what
  * Catalyst applies) across magnitudes, signs, boundary-adjacent
  * grid values, and accumulated folds. A divergence here would be an
  * oracle red on every power-chain / Bradley–Terry entry.
  */
class ExactRoundScalarSpec extends AnyFunSpec {

  private def ref(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def refFold(xs: Seq[Double]): Double =
    xs.iterator
      .map(x => BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _).toDouble

  describe("scaled8") {
    it("equals the BigDecimal reference on random values across 14 magnitudes") {
      val rnd = new scala.util.Random(13)
      var n = 0
      while (n < 200000) {
        val mag = math.pow(10.0, rnd.nextInt(14) - 7)
        val x = (rnd.nextDouble() - 0.5) * mag
        assert(ExactRound.scaled8(x) == ref(x), s"x = $x")
        n += 1
      }
    }

    it("equals the reference on boundary-adjacent grid values (ties land in the fallback)") {
      // multiples of 0.5e-8 sit (up to double representation error)
      // ON the half-up boundaries — the exact region the fast path
      // must refuse
      for (k <- -20000 to 20000) {
        val tie = k / 2e8
        assert(ExactRound.scaled8(tie) == ref(tie), s"tie x = $tie")
        val grid = k / 1e8
        assert(ExactRound.scaled8(grid) == ref(grid), s"grid x = $grid")
        val nearInt = k.toDouble
        assert(ExactRound.scaled8(nearInt) == ref(nearInt), s"int x = $nearInt")
      }
    }

    it("round-trips through unscale8 like a decimal(·,8) readout") {
      val rnd = new scala.util.Random(31)
      for (_ <- 1 to 1000) {
        val x = (rnd.nextDouble() - 0.5) * 1e4
        val viaFast = ExactRound.unscale8(ExactRound.scaled8(x))
        val viaRef = BigDecimal(x)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(viaFast == viaRef, s"x = $x")
      }
    }

    it("fails loudly past the scaled-long range instead of wrapping") {
      intercept[ArithmeticException](ExactRound.scaled8(1e12))
    }
  }

  describe("fold8") {
    it("equals the BigDecimal accumulation on random folds") {
      val rnd = new scala.util.Random(47)
      for (_ <- 1 to 500) {
        val xs = Vector.fill(rnd.nextInt(300) + 1)(
          (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(8) - 4))
        assert(ExactRound.fold8(xs) == refFold(xs))
      }
    }

    it("is 0.0 on the empty fold, matching the BigDecimal sum") {
      assert(ExactRound.fold8(Nil) == 0.0)
      assert(refFold(Nil) == 0.0)
    }
  }
}
