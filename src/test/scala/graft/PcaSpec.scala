package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{Similarity, Staging}

/** Property tests for [[Similarity.pcaTop]] against an INDEPENDENT
  * naive reference: covariance and power iteration recomputed here
  * in plain double arithmetic (no quantization, no decimal folds),
  * so agreement certifies the distributed moment rollup + portable
  * iteration pipeline rather than replaying its own conventions.
  * The value-level certification is the DuckDB oracle; these tests
  * pin the linear-algebra semantics the oracle's fixed corpus
  * cannot isolate.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic anisotropic cloud: points along `axis` with a
    * large spread plus small off-axis wiggle, offset by `shift`
    * (the mean must not leak into the covariance).
    */
  private def cloud(shift: Array[Double]): Seq[(Long, Seq[Double])] = {
    val axis = Array(0.6, -0.3, 0.7, 0.2)
    (0 until 40).map { k =>
      val t = (k % 9) - 4.0          // -4..4 along the main axis
      val w1 = ((k * 7) % 5 - 2) * 0.05
      val w2 = ((k * 11) % 7 - 3) * 0.04
      val v = Array(
        axis(0) * t + w1 + shift(0),
        axis(1) * t - w2 + shift(1),
        axis(2) * t + w2 + shift(2),
        axis(3) * t - w1 + shift(3))
      (k.toLong, v.toSeq)
    }
  }

  /** Naive reference: exact-double covariance of the ×1000-quantized
    * vectors (matching pcaTop's input contract, not its arithmetic),
    * power-iterated from e₁ with per-step L2 normalization.
    */
  private def reference(rows: Seq[Seq[Double]], iters: Int)
      : (Array[Double], Double, Double) = {
    val q = rows.map(_.map(x => math.round(x * 1000).toDouble).toArray)
    val d = q.head.length
    val n = q.size.toDouble
    val mean = Array.tabulate(d)(i => q.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      q.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n / 1e6)
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val t = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(t.map(x => x * x).sum)
      v = t.map(_ / nrm)
    }
    val gv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val lam = (0 until d).map(i => v(i) * gv(i)).sum /
      (0 until d).map(i => v(i) * v(i)).sum
    val trace = (0 until d).map(i => cov(i)(i)).sum
    (v, lam, lam / trace)
  }

  private def run(rows: Seq[(Long, Seq[Double])]): Map[Long, (Double, Double, Double)] = {
    val df = rows.toDF("vec_id", "emb")
    val out = Similarity.pcaTop(df, iters = 8)
      .collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Double]("loading"), r.getAs[Double]("eigval"),
          r.getAs[Double]("var_share"))))
      .toMap
    Staging.releaseAll()
    out
  }

  test("pcaTop recovers the planted dominant direction, its Rayleigh " +
    "eigenvalue, and the variance share — within rounding tolerance of " +
    "an independent full-double reference") {
    val rows = cloud(Array(0.0, 0.0, 0.0, 0.0))
    val got = run(rows)
    val (refV, refLam, refShare) = reference(rows.map(_._2), 8)
    assert(got.keySet === Set(1L, 2L, 3L, 4L), "one row per dimension, 1-based")
    val v = (1 to 4).map(i => got(i.toLong)._1).toArray
    val dot = v.zip(refV).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) > 0.9999,
      s"loadings must align with the reference eigenvector; |dot|=$dot")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-4,
      "loadings must be unit-norm up to 6-dp rounding")
    assert(math.abs(got(1L)._2 - refLam) < 1e-3 * math.max(1.0, refLam),
      s"eigval ${got(1L)._2} must match reference $refLam")
    assert(math.abs(got(1L)._3 - refShare) < 1e-3,
      s"var_share ${got(1L)._3} must match reference $refShare")
    assert(got(1L)._3 > 0.9,
      "a strongly anisotropic cloud concentrates variance on one axis")
  }

  test("pcaTop is shift-invariant: a constant offset on every vector " +
    "changes nothing (the mean never leaks into the covariance)") {
    val base = run(cloud(Array(0.0, 0.0, 0.0, 0.0)))
    val shifted = run(cloud(Array(3.2, -1.5, 0.25, 9.0)))
    for (i <- 1L to 4L) {
      assert(math.abs(base(i)._1 - shifted(i)._1) < 2e-4,
        s"loading at dim $i moved under a constant shift")
      assert(math.abs(base(i)._2 - shifted(i)._2) < 1e-4,
        s"eigval moved under a constant shift")
    }
  }

  test("pcaTop rejects a non-positive iteration count") {
    val df = cloud(Array(0.0, 0.0, 0.0, 0.0)).toDF("vec_id", "emb")
    intercept[IllegalArgumentException] {
      Similarity.pcaTop(df, iters = 0)
    }
  }

  /** Two planted orthogonal directions with distinct spreads: the
    * deflated chain must recover the SECOND one and the gap must
    * read their variance ratio.
    */
  private def twoAxisCloud: Seq[(Long, Seq[Double])] = {
    val a1 = Array(0.5, 0.5, 0.5, 0.5)   // unit, spread ±4
    val a2 = Array(0.5, -0.5, 0.5, -0.5) // unit, orthogonal, spread ±2
    (0 until 45).map { k =>
      val t1 = (k % 9) - 4.0
      val t2 = ((k / 9) % 5) - 2.0
      val w = ((k * 13) % 7 - 3) * 0.02
      val v = Array.tabulate(4)(i => a1(i) * t1 + a2(i) * t2 +
        (if (i == 2) w else -w * 0.5))
      (k.toLong, v.toSeq)
    }
  }

  test("pcaSpectrum: the deflated chain recovers the second planted " +
    "direction, orthogonal to the first, with the spectral gap " +
    "reading the planted variance ratio") {
    val rows = twoAxisCloud
    val df = rows.toDF("vec_id", "emb")
    val top = Similarity.pcaTop(df, iters = 8).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Double]("loading")).toMap
    Staging.releaseAll()
    val out = Similarity.pcaSpectrum(df, iters = 8).collect()
    Staging.releaseAll()
    val byDim = out.map(r => r.getAs[Long]("dim") ->
      r.getAs[Double]("loading2")).toMap
    val v1 = (1 to 4).map(i => top(i.toLong)).toArray
    val v2 = (1 to 4).map(i => byDim(i.toLong)).toArray
    val dot12 = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-3,
      s"the second component must be orthogonal to the first; dot=$dot12")
    val a2 = Array(0.5, -0.5, 0.5, -0.5)
    val align = v2.zip(a2).map { case (a, b) => a * b }.sum
    assert(math.abs(align) > 0.999,
      s"the second component must recover the second planted axis; |dot|=$align")
    val e1 = out.head.getAs[Double]("eigval1")
    val e2 = out.head.getAs[Double]("eigval2")
    val gap = out.head.getAs[Double]("spectral_gap")
    assert(e1 > e2 && e2 > 0,
      s"eigenvalues must order: $e1 > $e2 > 0")
    assert(math.abs(gap - e1 / e2) < 1e-3,
      "spectral_gap must be the eigenvalue ratio")
    // planted: var along a1 from t1 in -4..4 uniform-ish vs a2 from
    // t2 in -2..2 — ratio ≈ (spread1/spread2)² ≈ 4, loosely
    assert(gap > 2.0 && gap < 8.0,
      s"the gap must reflect the planted anisotropy (~4): $gap")
  }
}
