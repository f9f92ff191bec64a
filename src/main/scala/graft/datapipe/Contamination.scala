package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination scoring: for every training document,
  * the fraction of its word k-shingles that appear ANYWHERE in a
  * benchmark corpus. Training sets are filtered on this score before
  * pretraining so eval benchmarks aren't memorized verbatim.
  *
  * Scale shape: the benchmark side (eval sets — thousands of
  * documents, not terabytes) collapses to a distinct set of 8-byte
  * shingle hashes that BROADCASTS; the training side is one
  * generator pass (explode) probed against the broadcast hash set
  * map-side, then a partial-aggregated count per document — the
  * 100 TB training corpus is never shuffled by shingle, only the
  * per-document counters move. Matching on xxhash64 longs instead of
  * shingle strings keeps the broadcast and the probes fixed-width
  * (the same collision-free-at-64-bit assumption the minhash/ngram
  * verification already relies on).
  */
object Contamination {

  /** (doc_id, n_shared, n_shingles, contamination) per training doc,
    * zero-filled for documents sharing nothing with the benchmark.
    */
  def score(train: DataFrame, bench: DataFrame, idCol: String,
            textCol: String, k: Int = 3): DataFrame = {
    val trainSh = train.select(col(idCol).as("doc_id"),
      Dedup.shingleHashes(Dedup.shingles(col(textCol), k)).as("hh"))
    val benchSet = bench
      .select(explode(Dedup.shingleHashes(Dedup.shingles(col(textCol), k)))
        .as("h"))
      .distinct()
    val shared = trainSh
      .select(col("doc_id"), explode(col("hh")).as("h"))
      .join(broadcast(benchSet), Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    trainSh
      .select(col("doc_id"), size(col("hh")).cast("bigint").as("n_shingles"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_shingles"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_shingles")).as("contamination"))
  }
}
