package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Synthesize a HIGHER-DIMENSIONAL embeddings twin of an sf dir —
  * the input for SCALE.md's dim-axis exponents. The row-axis scaling
  * runs (MakeScaleData) hold dimensionality fixed and grow n; this
  * tool holds n fixed and grows dim by an integer `factor` (default
  * 4: the fixture's dim 64 → 256, a production-embedding size), so
  * timing the embedding family at both dims isolates the
  * per-dimension cost — the axis where a d²-materializing covariance
  * rollup differs from a partition-local Gram accumulator by the
  * factor² itself.
  *
  * Expansion must not change the WORKLOAD SHAPE, only the width:
  * each output vector is `factor` deterministic variants of the
  * source vector laid side by side — copy c is the source reversed
  * when c is odd, rotated by 7·c positions, and scaled by
  * (-1)^c · (1 − c/(2·factor)) — so components stay float, no copy
  * is a verbatim repeat of another (a tiled identical copy would
  * make the covariance block-circulant and could collapse IVF cell
  * populations), magnitudes stay in the source's range, and two runs
  * produce bit-identical data. Every non-embedding table is copied
  * through unchanged, so any catalog entry runs against the dim dir
  * as-is.
  *
  * Usage: runMain graft.tools.MakeDimData [srcDir] [destDir] [factor]
  */
object MakeDimData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/root/repo/.scaledata/dim256")
    val factor = args.lift(2).map(_.toInt).getOrElse(4)
    require(factor >= 1 && factor <= 64, s"factor in [1, 64]; got $factor")
    val spark = GraftSession.get()

    val emb = Tables.embeddings(spark, src)
    def variant(e: Column, c: Int): Column = {
      val base = if (c % 2 == 1) reverse(e) else e
      val k = (7 * c) % 64
      val rot =
        if (k == 0) base
        else concat(slice(base, k + 1, 10000), slice(base, 1, k))
      val s = (if (c % 2 == 1) -1.0 else 1.0) * (1.0 - c / (2.0 * factor))
      transform(rot, x => (x * lit(s)).cast("float"))
    }
    val wide = flatten(array((0 until factor).map(c =>
      variant(col("embedding"), c)): _*))
    emb.select(col("vec_id"), wide.as("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    for (t <- Seq("documents", "events", "region", "nation", "customer",
      "supplier", "part", "orders", "lineitem"))
      Tables.table(spark, src, t)
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")

    println(s"wrote dim-expanded tables (factor $factor) to $dest")
    spark.stop()
  }
}
