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
    * A null-text document still emits its row — as (0, 0, null),
    * since a contamination fraction over zero shingles is undefined.
    */
  def score(train: DataFrame, bench: DataFrame, idCol: String,
            textCol: String, k: Int = 3): DataFrame = {
    val benchSet = bench
      .select(explode(Dedup.hashedShingles(col(textCol), k)).as("h"))
      .distinct()
    // ONE training-side pass: every exploded shingle probes the
    // broadcast set via an outer join whose `hit` marker is counted
    // next to the total in a single aggregation. (A separate
    // size(hh) branch for the total would re-run the whole shingle
    // pipeline a second time.) shingles() never returns an empty
    // array for non-null text, and explode_OUTER keeps a null-text
    // document as one null-hash row, so every document survives the
    // aggregation and no zero-fill join is needed; the null-safe
    // count(h) scores that one carrier row as zero shingles.
    train
      .select(col(idCol).as("doc_id"),
        explode_outer(Dedup.hashedShingles(col(textCol), k)).as("h"))
      .join(broadcast(benchSet.select(col("h"), lit(1).as("hit"))),
        Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("h")).as("n_shingles"), count(col("hit")).as("n_shared"))
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        when(col("n_shingles") === 0, lit(null).cast("double"))
          .otherwise(col("n_shared").cast("double") / col("n_shingles"))
          .as("contamination"))
  }

  /** [[score]] for a reference side that is ITSELF corpus-scale —
    * the split-hygiene audit (train vs held-out), cross-snapshot
    * contamination, corpus-vs-corpus overlap. A broadcast (or even a
    * Bloom filter) of the reference's shingle set no longer fits when
    * the reference is 10% of 100 TB, so both sides shuffle ONCE on
    * the 8-byte shingle hash and meet in a co-partitioned hash join:
    * per-reducer state is the reference partition's distinct hashes
    * (the build side, pinned via the shuffle_hash hint — sort-merge
    * would sort the exploded probe stream for no downstream benefit),
    * and the probe side streams. A hot shingle skews only the
    * streamed probe partition, never the build table, because the
    * reference side is distinct-per-hash by construction.
    */
  def scoreShuffled(docs: DataFrame, ref: DataFrame, idCol: String,
                    textCol: String, k: Int = 3): DataFrame = {
    val refSet = ref
      .select(explode(Dedup.hashedShingles(col(textCol), k)).as("h"))
      .distinct()
    docs
      .select(col(idCol).as("doc_id"),
        explode_outer(Dedup.hashedShingles(col(textCol), k)).as("h"))
      .join(refSet.select(col("h"), lit(1).as("hit")).hint("shuffle_hash"),
        Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("h")).as("n_shingles"), count(col("hit")).as("n_shared"))
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        when(col("n_shingles") === 0, lit(null).cast("double"))
          .otherwise(col("n_shared").cast("double") / col("n_shingles"))
          .as("contamination"))
  }
}
