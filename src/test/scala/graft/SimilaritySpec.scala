package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Similarity

/** IVF pruning: the pruned variant must return exactly the join-only
  * variant's results AND push the cell restriction into the parquet
  * scan (PushedFilters) — the partition-pruning contract at the
  * 100 TB label-partitioned layout.
  */
class SimilaritySpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("label").as("q_label"),
      col("emb").as("q_emb"))

  test("pruned IVF == join-only IVF results") {
    val a = Similarity.ivfTopK(emb, queries, 5).collect().toSet
    val b = Similarity.ivfTopKPruned(emb, queries, 5).collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("the cell restriction reaches the scan as a pushed filter") {
    val pruned = Similarity.ivfTopKPruned(emb, queries, 5)
    val scans = pruned.queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters: [In(label"),
      s"expected In(label, ...) in scan pushdown; plan:\n${scans.take(2000)}")
  }

  test("k-means assignment is deterministic, complete, and balanced-ish") {
    val a1 = Similarity.kmeansAssign(emb.select(col("vec_id"), col("emb")), 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val a2 = Similarity.kmeansAssign(emb.select(col("vec_id"), col("emb")), 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a1 === a2)
    assert(a1.size === emb.count())
    assert(a1.values.forall(c => c >= 0 && c < 8))
    // Lloyd's on md5-spread seeds should populate every cell here
    assert(a1.values.toSet.size === 8)
  }

  test("k-means IVF reaches usable recall@k against brute force") {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val exact = Similarity.bruteForceTopK(emb, qs, 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopKKmeans(
      emb.select(col("vec_id"), col("emb")), qs, 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"recall@5 over ${exact.size} truth pairs: $recall")
    // single-probe IVF over 8 cells: most neighbours share the
    // query's cell; the floor documents the quality bar
    assert(recall >= 0.5, s"recall@5 $recall below 0.5")
  }
}
