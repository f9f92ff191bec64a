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
}
