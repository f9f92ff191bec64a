package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{Relevance, Similarity}
import graft.functions.ExactRound

/** Regression contracts for the round-14 advice fixes: null
  * embeddings must not desynchronize VecAgg sums from row counts
  * (Similarity trainers/drift), a degenerate all-zero-weight
  * bootstrap rep must not shift the percentile ranks through a
  * NULL-first ordering, and [[ExactRound.fold8]] must fall back to
  * BigDecimal accumulation past the scaled-long domain instead of
  * throwing.
  */
class RoundFourteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def embRow(id: Long, v: Seq[Float]): (Long, Seq[Float]) = (id, v)

  test("sourceCentroidDrift: a NULL embedding is dropped from BOTH the " +
    "component sums and the row counts — output identical to removing " +
    "the row") {
    val docs = Seq(
      (1L, "web"), (2L, "web"), (3L, "web"), (4L, "books"), (5L, "books"))
      .toDF("doc_id", "source")
    val vecs = Seq(
      embRow(1L, Seq(1.0f, 0.0f)), embRow(2L, Seq(0.0f, 1.0f)),
      embRow(4L, Seq(0.5f, 0.5f)), embRow(5L, Seq(0.25f, 0.75f)))
    val withNull = (vecs.map { case (i, v) => (i, v: Seq[Float]) } :+
      ((3L, null: Seq[Float]))).toDF("vec_id", "emb")
    val without = vecs.toDF("vec_id", "emb")
    val a = Similarity.sourceCentroidDrift(docs, withNull)
      .orderBy("source").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val b = Similarity.sourceCentroidDrift(docs, without)
      .orderBy("source").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq)
    // and n_docs for "web" counts the two NON-NULL vectors, not 3
    assert(a.find(_._1 == "web").get._2 === 2L)
  }

  test("kmeansAssign: a NULL embedding row neither seeds nor shifts the " +
    "trained centroids — non-null assignments identical to training " +
    "without it") {
    val vecs = (0 until 12).map(i =>
      embRow(i.toLong, Seq((i % 3).toFloat, (i % 4).toFloat)))
    val withNull = (vecs :+ ((99L, null: Seq[Float])))
      .toDF("vec_id", "emb")
    val without = vecs.toDF("vec_id", "emb")
    val a = Similarity.kmeansAssign(withNull, k = 3, iters = 3)
      .filter(col("vec_id") =!= 99L)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Similarity.kmeansAssign(without, k = 3, iters = 3)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("bootstrapCI: degenerate reps (all Poisson weights zero) are " +
    "excluded from the percentile ranking instead of ranking NULL " +
    "first — a single always-correct item reads CI [1, 1]") {
    // ONE item: each rep's den is a single Poisson(1) draw, so
    // ~36.8% of reps are degenerate — the old NULL-first ordering
    // put a NULL at the lo rank with near-certainty at 40 reps
    val items = Seq(("a", true)).toDF("id", "ok")
    val r = Relevance.bootstrapCI(items, "id", col("ok"), reps = 40)
      .collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(0) === 1L)          // n_items
    assert(row.getLong(1) === 40L)         // n_reps (requested)
    assert(row.getDouble(2) === 1.0)       // pass_rate
    assert(!row.isNullAt(3) && row.getDouble(3) === 1.0, "lo95")
    assert(!row.isNullAt(4) && row.getDouble(4) === 1.0, "hi95")
  }

  test("NormPrefixSq: one-pass prefix sums-of-squares agree with the " +
    "interpreted HOF folds they replace, across boundary widths, " +
    "empty arrays, null elements, and null input") {
    import graft.functions.NormPrefixSq
    val dims = Seq(1, 3, 4, 7)
    val rows = Seq(
      (1L, Seq[java.lang.Long](3L, -2L, 0L, 5L)),
      (2L, Seq[java.lang.Long](1L, 1L, 1L)),
      (3L, Seq.empty[java.lang.Long]),
      (4L, Seq[java.lang.Long](7L, null, 2L)),
      (5L, null))
      .toDF("id", "q")
    val out = rows.select(col("id"), NormPrefixSq.of(col("q"), dims).as("ps"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    def expect(xs: Seq[java.lang.Long]): Seq[Long] = {
      val vals = xs.map(x => if (x == null) 0L else x.longValue)
      Seq(xs.size.toLong, vals.map(v => v * v).sum) ++
        dims.map(d => vals.take(d).map(v => v * v).sum)
    }
    assert(out(1L) === expect(Seq[java.lang.Long](3L, -2L, 0L, 5L)))
    assert(out(2L) === expect(Seq[java.lang.Long](1L, 1L, 1L)))
    assert(out(3L) === expect(Seq.empty))
    assert(out(4L) === expect(Seq[java.lang.Long](7L, null, 2L)))
    assert(out(5L) === null, "null input -> null output")
  }

  test("truncationProfile: the fused-expression rewrite leaves the " +
    "readout identical to the r13 HOF form (driver replay of the " +
    "norm-ratio arithmetic on hand vectors)") {
    val vecs = Seq(
      (1L, Seq(0.9, 0.1, 0.05, 0.02)),
      (2L, Seq(0.1, 0.2, 0.7, 0.68)),
      (3L, Seq(0.5, 0.5, 0.5, 0.5)))
      .toDF("vec_id", "emb")
    val out = Similarity.truncationProfile(vecs, "emb", Seq(2, 4))
      .collect().map(r => r.getLong(0) -> r).toMap
    def q(x: Double): Long = math.round(x * 1000)
    def cosAt(v: Seq[Double], d: Int): Double = {
      val qs = v.map(q)
      val full = qs.map(x => x * x).sum.toDouble
      val pre = qs.take(d).map(x => x * x).sum.toDouble
      BigDecimal(math.sqrt(pre / full))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val all = Seq(Seq(0.9, 0.1, 0.05, 0.02), Seq(0.1, 0.2, 0.7, 0.68),
      Seq(0.5, 0.5, 0.5, 0.5))
    for (d <- Seq(2, 4)) {
      val cs = all.map(v => cosAt(v, d))
      assert(out(d.toLong).getAs[Long]("n_vecs") === 3L)
      assert(out(d.toLong).getAs[Double]("min_cos") === cs.min, s"d=$d")
      val meanExpect = BigDecimal(cs.map(BigDecimal(_)).sum.toDouble / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(d.toLong).getAs[Double]("mean_cos") === meanExpect, s"d=$d")
    }
  }

  test("minhashProbePrebuilt: probing against a parquet-materialized " +
    "signature/bucket index returns row-identical pairs to the " +
    "rebuild-per-run probe") {
    import graft.datapipe.Dedup
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different document about spark and scala joins"),
      (3L, "data pipelines dedup documents with minhash lsh candidate joins"),
      (4L, "the quick brown fox jumps over the lazy dog again and often"))
      .toDF("id", "text")
    val delta = Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again"),
      (12L, "nothing like anything in the index corpus at all whatsoever"),
      (13L, "data pipelines dedup documents with minhash lsh candidate join"))
      .toDF("id", "text")
    val expected = Dedup.minhashProbe(base, delta, "id", "text",
        numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft_probe_prebuilt_spec").toString
    val idx = Dedup.minhashIndexTable(base, "id", "text", numHashes = 64)
    idx.write.mode("overwrite").parquet(s"$dir/hh")
    Dedup.minhashBucketsTable(idx).write.mode("overwrite").parquet(s"$dir/bb")
    val got = Dedup.minhashProbePrebuilt(
        spark.read.parquet(s"$dir/hh"), spark.read.parquet(s"$dir/bb"),
        delta, "id", "text", numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === expected)
    assert(got.exists { case (d, i, j) => d == 11L && i == 1L && j == 1.0 },
      "the exact copy must surface at jaccard 1.0")
  }

  test("fold8: past the scaled-long domain the fold falls back to " +
    "BigDecimal accumulation (old domain) instead of throwing; inside " +
    "the domain the two paths agree bit-for-bit") {
    def big(xs: Seq[Double]): Double =
      xs.foldLeft(java.math.BigDecimal.ZERO)((acc, x) =>
        acc.add(java.math.BigDecimal.valueOf(x)
          .setScale(8, java.math.RoundingMode.HALF_UP))).doubleValue()
    // single term past |x| >= ~9.2e10 (scaled8 alone would throw)
    val huge = Seq(1.0e11, 1.5, -2.25e10)
    assert(ExactRound.fold8(huge) === big(huge))
    // accumulator overflow without any single term overflowing
    val acc = Seq.fill(12)(8.0e9)
    assert(ExactRound.fold8(acc) === big(acc))
    // normal domain unchanged
    val normal = Seq(1.23456789, -0.000000005, 42.0, 1e-9, 3.14159265)
    assert(ExactRound.fold8(normal) === big(normal))
  }
}
