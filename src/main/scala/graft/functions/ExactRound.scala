package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable HALF_UP rounding of integer ratios.
  *
  * `round(a/b, d)` on a DOUBLE is not portable: Spark rounds the
  * shortest decimal repr of the double via BigDecimal HALF_UP, while
  * other engines round the binary value directly, so tie-region
  * quotients (x.…5 at the target scale) flip between engines — the
  * r8/r9 `corpus_stats` red. Decimal division isn't portable either
  * (DuckDB's `/` on DECIMAL returns DOUBLE). The only formulation
  * every engine reproduces bit-for-bit is pure integer arithmetic:
  *
  *   round_half_up(a/b, d) = floor((2·a·10^d + b) / (2·b)) / 10^d
  *
  * for non-negative integers a, b. The numerator is built in exact
  * DECIMAL arithmetic (a long multiply would overflow for large
  * a·10^d) and the division runs at decimal scale 12, where the
  * quotient's fractional parts (exact multiples of 1/(2b), so
  * ≥ 5e-13 from any integer for b < 10^12) can never straddle
  * `floor`'s boundary — `floor` recovers the exact integer quotient.
  * The final scaled/10^d is ONE correctly-rounded IEEE double
  * division, identical in any engine.
  *
  * Contract: 0 ≤ a, 0 < b < 10^12, a·10^d < 10^26 (26 integer
  * digits at the division's decimal(38,12) working type). b = 0 or
  * NULL yields NULL — the same as both engines' integer `//`.
  *
  * Oracle twin (DuckDB): `((2*a*10^d + b) // (2*b)) / (10^d)::DOUBLE`.
  */
object ExactRound {

  /** round(a/b, 6) as a DOUBLE, engine-exact. */
  def ratio6(a: Column, b: Column): Column = ratio(a, b, 6)

  /** round(a/b, `scale`) as a DOUBLE, engine-exact, scale ≤ 9. */
  def ratio(a: Column, b: Column, scale: Int): Column =
    scaledFloor(a, b, scale).cast("double") /
      lit(math.pow(10, scale).toLong.toDouble)

  /** The 10^scale-scaled integer numerator of [[ratio]] — i.e.
    * round_half_up(a/b, scale)·10^scale as a LONG (same contract as
    * [[ratio]] plus the quotient·10^scale must fit a signed long —
    * always true for fractions a ≤ b; NULL when b is 0/NULL). The
    * building block for exact MEANS of exact-rounded ratios: sum the
    * scaled integers (order-independent), divide once at the end.
    * Oracle twin: `(2*a*10^s + b) // (2*b)`.
    */
  def ratioScaled(a: Column, b: Column, scale: Int): Column =
    scaledFloor(a, b, scale).cast("long")

  // the exact decimal floor((2·a·10^scale + b) / (2·b)) both
  // readouts cast from
  private def scaledFloor(a: Column, b: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 9, s"scale $scale out of range")
    val pow = math.pow(10, scale).toLong
    val num = (a.cast("decimal(38,0)") * lit(2L * pow) +
      b.cast("decimal(38,0)")).cast("decimal(38,12)")
    val den = b.cast("decimal(38,0)") * lit(2L)
    floor(try_divide(num, den))
  }

  // ----------------------------------------------------------------
  // Driver-side images of Catalyst round(double, 8) — the scalar
  // twins the bounded-model iterations (power chains, Bradley–Terry)
  // replay. The CONTRACT is bit-identity with
  // `java.math.BigDecimal.valueOf(x).setScale(8, HALF_UP)` (what
  // Catalyst's round() applies to doubles: the SHORTEST decimal
  // repr, rounded half-up). The naive implementation allocates 3+
  // BigDecimals per term — at dim 512 a power chain folds ~4M terms
  // and the allocation churn, not the arithmetic, dominated the PCA
  // entries (the round-13 dim-axis SCALE wave measured it). The fast
  // path below rounds via one double multiply + floor and is taken
  // only when the result is PROVABLY the same: y = fl(x·1e8) sits
  // within ~1.5 ulp of shortest(x)·1e8, so whenever y's fractional
  // part is farther than an 8-ulp guard band from both rounding
  // boundaries (an integer, or a half-integer tie), floor/ceil on y
  // equals the BigDecimal rounding; anything inside a band — ties
  // included — falls back to BigDecimal itself. ExactRoundScalarSpec
  // property-checks the equivalence across magnitudes and
  // boundary-adjacent values.
  // ----------------------------------------------------------------

  /** round_half_up(x, 8 dp) as the ×10⁸-scaled LONG — bit-identical
    * to `BigDecimal.valueOf(x).setScale(8, HALF_UP).unscaledValue()`.
    * Fails loudly (ArithmeticException) when the scaled value
    * overflows a long (|x| ≥ ~9.2e10) instead of wrapping.
    */
  def scaled8(x: Double): Long = {
    val y = x * 1e8
    if (java.lang.Double.isFinite(y) && math.abs(y) < 4.6e17) {
      val f = math.floor(y)
      val frac = y - f
      val eps = math.ulp(math.max(math.abs(y), 1.0)) * 8.0
      if (frac > eps && frac < 0.5 - eps) return f.toLong
      if (frac > 0.5 + eps && frac < 1.0 - eps) return f.toLong + 1L
    }
    java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** The double image of a ×10⁸-scaled long — the same
    * `BigDecimal(unscaled, 8).doubleValue()` a decimal(·,8) readout
    * casts through.
    */
  def unscale8(scaled: Long): Double =
    java.math.BigDecimal.valueOf(scaled, 8).doubleValue()

  /** The engines' shared portable fold, replayed on the driver:
    * Σ round8(x_k) accumulated EXACTLY at scale 8 (scaled longs,
    * overflow-checked), returned as its double image — bit-identical
    * to accumulating `BigDecimal.setScale(8, HALF_UP)` values and
    * the column-expression fold `sum(round(x, 8)::decimal(28,8))`
    * it stands in for, at a fraction of the allocation cost.
    *
    * Domain: the fast scaled-long path covers |term| < ~9.2e10 and
    * |Σ| < ~9.2e10; PAST either bound the fold falls back to the
    * BigDecimal accumulation it is an image of (the pre-r13
    * implementation), preserving the unbounded domain driver-side
    * callers (power chains, Bradley–Terry, fold8 readouts) had
    * before the scaled-long rewrite — extreme inputs get the old
    * exact-arbitrary-precision answer instead of an
    * ArithmeticException (the r13 advice finding).
    *
    * REQUIRES a re-iterable collection (the standard `Iterable`
    * contract): the overflow fallback restarts iteration from the
    * beginning. A one-shot iterator dressed as an Iterable would
    * fold only its unconsumed tail — so such inputs are rejected
    * loudly rather than silently misfolded (the r14 advice finding);
    * callers holding an Iterator should pass `it.toSeq`.
    */
  def fold8(xs: Iterable[Double]): Double = {
    // every strict stdlib collection re-iterates; a hand-rolled
    // Iterator wrapper (not a stdlib collection type) is the only
    // shape that can't, and only the fallback path needs it
    def reIterable = xs.isInstanceOf[scala.collection.Seq[_]] ||
      xs.isInstanceOf[scala.collection.Set[_]] ||
      xs.isInstanceOf[scala.collection.Map[_, _]] ||
      xs.isInstanceOf[scala.collection.View[_]] ||
      xs.isInstanceOf[scala.collection.Iterable[_]] &&
        xs.knownSize >= 0
    var acc = 0L
    val it = xs.iterator
    while (it.hasNext) {
      try acc = Math.addExact(acc, scaled8(it.next()))
      catch {
        case _: ArithmeticException =>
          if (!reIterable) throw new IllegalArgumentException(
            "fold8 overflow fallback needs a re-iterable collection; " +
              "got a one-shot Iterable already partially consumed — " +
              "materialize (toSeq) before folding")
          return fold8Big(xs)
      }
    }
    unscale8(acc)
  }

  // the unbounded-magnitude image: Σ BigDecimal(x).setScale(8,
  // HALF_UP), identical to the scaled-long fold wherever both are
  // defined (ExactRoundScalarSpec pins the equivalence)
  private def fold8Big(xs: Iterable[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    val it = xs.iterator
    while (it.hasNext)
      acc = acc.add(java.math.BigDecimal.valueOf(it.next())
        .setScale(8, java.math.RoundingMode.HALF_UP))
    acc.doubleValue()
  }
}
