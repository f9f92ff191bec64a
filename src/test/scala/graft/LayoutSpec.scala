package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Layout

/** Z-order layout: interleave kernel hand-check, quadrant nesting
  * (the high bits ARE the coarse spatial address), and the
  * range-exchange layout contract.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zkey interleaves bucket bits: hand-checked Morton codes") {
    // values 0..255 with min 0 / max 255 → identity bucketing, so
    // the key is the pure interleave; u=(5, 3) → bits 101 ⋈ 011 →
    // z = 0b011011 = 27
    val df = Seq((0L, 0.0, 0.0), (1L, 255.0, 255.0), (2L, 5.0, 3.0))
      .toDF("id", "x", "y")
    val out = Layout.zOrderKey(df,
        Seq(col("x") -> "x", col("y") -> "y"), bits = 8)
      .select(col("id"), col("x_bucket"), col("y_bucket"), col("zkey"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) === ((0L, 0L, 0L)))
    assert(out(1L) === ((255L, 255L, 65535L)), "all 16 bits set")
    assert(out(2L) === ((5L, 3L, 27L)))
  }

  test("high zkey bits address the quadrant (curve nesting)") {
    // 4 points, one per quadrant of the [0,255]^2 grid: the top two
    // bits of the 16-bit key must equal (x_top | y_top << 1), so
    // sorting by zkey groups quadrants contiguously
    val df = Seq((0L, 10.0, 10.0), (1L, 200.0, 10.0),
      (2L, 10.0, 200.0), (3L, 200.0, 200.0), (4L, 0.0, 0.0),
      (5L, 255.0, 255.0)).toDF("id", "x", "y")
    val rows = Layout.zOrderKey(df,
        Seq(col("x") -> "x", col("y") -> "y"), bits = 8)
      .select(col("id"), col("x_bucket"), col("y_bucket"), col("zkey"))
      .collect()
    for (r <- rows) {
      val (xb, yb, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert((z >> 14) === ((xb >> 7) | ((yb >> 7) << 1)),
        s"id ${r.getLong(0)}: top key bits must be the quadrant")
    }
  }

  test("NULL and NaN bucket to 0 with a non-null zkey; stats ignore NaN") {
    val rows = Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
      (1L, 0.0, 0.0), (2L, 100.0, 100.0),
      (3L, null, 50.0), (4L, Double.NaN, 50.0))
    val df = rows.toDF("id", "x", "y")
    val out = Layout.zOrderKey(df, Seq(col("x") -> "x", col("y") -> "y"))
      .select(col("id"), col("x_bucket"), col("zkey")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.isNullAt(2))).toMap
    assert(out(3L) === ((0L, false)), "NULL buckets to 0, zkey non-null")
    assert(out(4L) === ((0L, false)), "NaN buckets to 0, zkey non-null")
    // NaN stayed out of the scale stats: row 2 still hits the top bucket
    assert(out(2L)._1 === 255L, "max row keeps the top bucket")
  }

  test("zOrderRepartition yields contiguous, sorted zkey ranges") {
    val df = (0L until 400L).map(i =>
      (i, (i * 37 % 400).toDouble, (i * 91 % 400).toDouble))
      .toDF("id", "x", "y")
    val parts = Layout.zOrderRepartition(df,
        Seq(col("x") -> "x", col("y") -> "y"), numPartitions = 4)
      .select(col("zkey")).rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    for (p <- parts)
      assert(p === p.sorted, "keys sorted within each partition")
    val spans = parts.map(p => (p.min, p.max)).sortBy(_._1)
    for (Seq((_, hi), (lo, _)) <- spans.sliding(2).map(_.toSeq))
      assert(hi <= lo, "partition zkey ranges must not overlap")
  }

  test("compactionPlan: sequential fill bins by start offset, " +
    "partitions plan independently, an oversized file opens its own " +
    "bin") {
    // part p, target 100: files 60,60 -> starts 0,60 -> bin 0 (120B
    // overflow-by-one-file); 250 at start 120 -> bin 1 (oversized,
    // alone); 10 at start 370 -> bin 3 (bin 2 skipped: the big file
    // consumed its budget); part q restarts at offset 0
    val files = Seq(("p", 1L, 60L), ("p", 2L, 60L), ("p", 3L, 250L),
      ("p", 4L, 10L), ("q", 9L, 40L)).toDF("part", "fid", "bytes")
    val out = Layout.compactionPlan(files, "part", "fid", "bytes", 100L)
      .collect().map(r => (r.getAs[String]("part"), r.getAs[Long]("bin_id"))
        -> ((r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"),
          r.getAs[Long]("first_file"), r.getAs[Long]("last_file")))).toMap
    assert(out(("p", 0L)) === ((2L, 120L, 1L, 2L)))
    assert(out(("p", 1L)) === ((1L, 250L, 3L, 3L)))
    assert(out(("p", 3L)) === ((1L, 10L, 4L, 4L)))
    assert(out(("q", 0L)) === ((1L, 40L, 9L, 9L)))
    assert(out.size === 4)
  }
}
