package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSimilarity

/** Similarity search over an embedding column.
  *
  * Two tiers, per the usual ANN playbook:
  *  - [[bruteForceTopK]]: exact top-k by cosine. The query set is
  *    broadcast; candidates stream through the fused
  *    [[graft.functions.CosineSimilarity]] loop — no shuffle of the
  *    candidate side at all, so it scales to any corpus size (cost is
  *    one scan × |queries|).
  *  - [[ivfTopK]]: IVF-style partition pruning — search only
  *    candidates in the query's coarse cell; at scale the cell id
  *    becomes the table's partition key so pruning happens at the
  *    parquet-scan level (partition pruning, not a post-filter).
  */
object Similarity {

  /** Scores rounded to 4 dp with vec_id tie-break — deterministic
    * and engine-portable ranking.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = emb
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("score", round(cosineSimilarity(col("q_emb"), col("emb")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** IVF with the `label` column as coarse cell: candidates are
    * pruned to the query's cell before scoring.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = emb
      .join(broadcast(queries),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .withColumn("score", round(cosineSimilarity(col("q_emb"), col("emb")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** Embedding near-duplicate pairs: cosine above `threshold`.
    * Brute-force all-pairs here; the LSH-bucketed variant (random
    * hyperplane signs as the bucket key) drops the quadratic term the
    * same way MinHash banding does for text.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), col("emb").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("emb").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("score", round(cosineSimilarity(col("a_emb"), col("b_emb")), 4))
      .filter(col("score") >= threshold)
      .select(col("a_id"), col("b_id"), col("score"))
  }
}
