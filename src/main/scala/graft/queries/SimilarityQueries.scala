package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.datapipe.{Multimodal, Similarity}

/** Similarity-search and multimodal queries over the embeddings and
  * documents tables.
  */
object SimilarityQueries {

  private def embDouble(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))

  /** DuckDB view matching embDouble. */
  private val embSqlCte =
    """e AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       FROM embeddings)"""

  private val simBruteForce = QueryDef(
    "sim_bruteforce_topk",
    (s, d) => {
      val e = embDouble(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      Similarity.bruteForceTopK(e, q, 5)
    },
    Some(s"""WITH $embSqlCte,
      q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 10),
      scored AS (SELECT q_id, vec_id,
          round(list_cosine_similarity(q_emb, emb), 4) AS score
        FROM q, e WHERE vec_id <> q_id),
      ranked AS (SELECT q_id, vec_id, score,
          CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT q_id, rnk, vec_id, score FROM ranked WHERE rnk <= 5"""))

  private val simIvf = QueryDef(
    "sim_ivf_topk",
    (s, d) => {
      val e = embDouble(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("emb").as("q_emb"))
      Similarity.ivfTopK(e, q, 5)
    },
    Some(s"""WITH $embSqlCte,
      q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb
            FROM e WHERE vec_id < 10),
      scored AS (SELECT q_id, vec_id,
          round(list_cosine_similarity(q_emb, emb), 4) AS score
        FROM q JOIN e ON label = q_label AND vec_id <> q_id),
      ranked AS (SELECT q_id, vec_id, score,
          CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT q_id, rnk, vec_id, score FROM ranked WHERE rnk <= 5"""))

  /** Same results as sim_ivf_topk (same oracle), but the query cells
    * are pushed to the candidate scan — SimilaritySpec asserts the
    * label filter lands in the parquet PushedFilters. */
  private val simIvfPruned = QueryDef(
    "sim_ivf_topk_pruned",
    (s, d) => {
      val e = embDouble(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("emb").as("q_emb"))
      Similarity.ivfTopKPruned(e, q, 5)
    },
    Some(s"""WITH $embSqlCte,
      q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb
            FROM e WHERE vec_id < 10),
      scored AS (SELECT q_id, vec_id,
          round(list_cosine_similarity(q_emb, emb), 4) AS score
        FROM q JOIN e ON label = q_label AND vec_id <> q_id),
      ranked AS (SELECT q_id, vec_id, score,
          CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT q_id, rnk, vec_id, score FROM ranked WHERE rnk <= 5"""))

  /** The corpus has no true near-dup embeddings, so inject exact
    * twins (vec_id + 1000000) and find them back.
    */
  private val dedupEmbedding = QueryDef(
    "dedup_embedding_cosine",
    (s, d) => {
      // repartition: the test parquet is one split; see withTwins note
      val e = embDouble(s, d).repartition(s.sparkContext.defaultParallelism)
      val twins = e.select((col("vec_id") + 1000000).as("vec_id"),
        col("label"), col("emb"))
      Similarity.nearDupPairs(e.unionByName(twins), 0.999)
    },
    Some(s"""WITH $embSqlCte,
      e2 AS (SELECT vec_id, emb FROM e
             UNION ALL SELECT vec_id + 1000000, emb FROM e),
      pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          round(list_cosine_similarity(a.emb, b.emb), 4) AS score
        FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id)
      SELECT a_id, b_id, score FROM pairs WHERE score >= 0.999"""))

  private val multimodalDecode = QueryDef(
    "multimodal_decode",
    (s, d) => Multimodal.decodeMetadata(s, Tables.documents(s, d)),
    Some("""SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS width,
      ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS height
      FROM documents"""))

  private val multimodalFeatures = QueryDef(
    "multimodal_features",
    (s, d) => Multimodal.extractFeatures(s, Tables.documents(s, d)),
    Some("""SELECT doc_id,
      ('0x' || substr(md5(text), 1, 4))::BIGINT / 65536.0 AS f0,
      ('0x' || substr(md5(text), 5, 4))::BIGINT / 65536.0 AS f1,
      ('0x' || substr(md5(text), 9, 4))::BIGINT / 65536.0 AS f2,
      ('0x' || substr(md5(text), 13, 4))::BIGINT / 65536.0 AS f3
      FROM documents"""))

  /** The distributed frame fan-out is the thing under test; the frame
    * BYTES are asserted in MultimodalSpec (reassembly == payload),
    * the oracle checks the fan-out arithmetic per document. */
  private val multimodalFrames = QueryDef(
    "multimodal_frames",
    (s, d) => Multimodal.frameSample(s, Tables.documents(s, d), 1024)
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("bigint").as("frame_bytes")),
    Some("""WITH b AS (SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents)
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        CASE WHEN (i + 1) * 1024 <= n THEN 1024 ELSE n - i * 1024 END
          AS frame_bytes
      FROM b, UNNEST(generate_series(0, CAST(ceil(n / 1024.0) AS BIGINT) - 1))
        AS t(i)"""))

  /** Crop-stub resize; the byte-level crop is asserted in
    * MultimodalSpec, the oracle checks the size arithmetic. */
  private val multimodalResize = QueryDef(
    "multimodal_resize",
    (s, d) => Multimodal.resize(s, Tables.documents(s, d), 32, 32)
      .select(col("doc_id"), octet_length(col("resized")).cast("bigint")
        .as("resized_bytes")),
    Some("""SELECT doc_id,
      least(CAST(octet_length(encode(text)) AS BIGINT), 1024) AS resized_bytes
      FROM documents"""))

  val defs: Seq[QueryDef] =
    Seq(simBruteForce, simIvf, simIvfPruned, dedupEmbedding,
      multimodalDecode, multimodalFeatures, multimodalFrames,
      multimodalResize)
}
