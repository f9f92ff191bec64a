package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Synthesize an sf1 (10×) testdata dir from the driver's sf0.1
  * fixtures — the input for SCALE.md's measured scaling exponents
  * (the one-decade empirical check behind the 100 TB plan-shape
  * claims).
  *
  * Replication must not change the WORKLOAD SHAPE, only its size:
  *
  *  - `documents`: `factor` replicas with disjoint id ranges; every
  *    replica after the first is Caesar-ciphered (`translate` over
  *    the lowercase alphabet AND digits, rotation = replica index) so
  *    cross-replica shingle/minhash similarity is ≈ 0. A verbatim
  *    copy would make every document a member of a `factor`-sized
  *    exact-dup cluster and blow the pair generators up
  *    quadratically — measuring a DIFFERENT (duplicate-saturated)
  *    workload, not the same workload at 10×. The cipher preserves
  *    lengths, whitespace, and token structure, so per-document
  *    costs (shingling, quality scores, token counts) are identical.
  *  - `embeddings`: id-offset replicas, vectors copied verbatim
  *    (ANN cost is driven by n and dimensionality, not values).
  *  - `events`: id/user offsets, timestamps unchanged (10× the
  *    traffic in the same window — what a larger deployment sees).
  *  - dimension-ish TPC-H tables: copied as-is (the heavy entries
  *    under scale test are all documents/events/embeddings-driven).
  *
  * Usage: runMain graft.tools.MakeScaleData [srcDir] [destDir] [factor]
  */
object MakeScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/root/repo/.scaledata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // Rotation 26 wraps to the identity cipher: replica 26 would be
    // a VERBATIM copy — exactly the duplicate-saturated workload the
    // cipher exists to prevent. Chain runs (sf1 → sf10) instead.
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] (rotation $factor % 26 would repeat a cipher); got $factor")
    val spark = GraftSession.get()
    // The cipher rotates lowercase letters AND digits (digits by
    // i % 10): a letters-only rotation leaves numeric/punctuation
    // tokens verbatim across replicas, silently weakening the
    // cross-replica-similarity≈0 guarantee on number-heavy text.
    // Replicas 10 apart share digit rotations but never letter
    // rotations, so full-token collisions still require digit-only
    // tokens — rare enough to keep pair workloads shape-stable.
    // Uppercase is untouched: the fixture corpus is lowercase (and
    // ciphered replicas of any uppercase would only raise, never
    // saturate, cross-replica distance).
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"

    /** Per-replica id stride derived from the SOURCE's max id — a
      * hardcoded stride would silently collide replica ranges when
      * re-run on this tool's own output (sf1 doc_ids reach ~50k) or
      * any >stride source, recreating the exact-dup saturation the
      * docstring warns invalidates the measurement.
      */
    def stride(df: org.apache.spark.sql.DataFrame, idCol: String): Long = {
      val maxId = df.agg(max(col(idCol).cast("bigint"))).head().getLong(0)
      maxId + 1
    }

    val docs = Tables.documents(spark, src)
    val docStride = stride(docs, "doc_id")
    // the dedup harness corpora add a 1e6 twin offset on top of
    // doc_id; replicated ids must stay under it
    require(docStride * factor < 1000000L,
      s"doc ids would reach ${docStride * factor}, colliding with the 1e6 twin offset")
    (0 until factor).map { i =>
      val rot = alpha.drop(i % 26) + alpha.take(i % 26) +
        digits.drop(i % 10) + digits.take(i % 10)
      docs.select(
        (col("doc_id") + lit(i.toLong * docStride)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), alpha + digits, rot))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")

    val emb = Tables.embeddings(spark, src)
    val vecStride = stride(emb, "vec_id")
    (0 until factor).map { i =>
      emb.select((col("vec_id") + lit(i.toLong * vecStride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    val ev = Tables.events(spark, src)
    val evStride = stride(ev, "event_id")
    val userStride = stride(ev, "user_id")
    (0 until factor).map { i =>
      ev.select((col("event_id") + lit(i.toLong * evStride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * userStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dest/events.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem"))
      Tables.table(spark, src, t)
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")

    println(s"wrote sf-scaled tables (factor $factor) to $dest")
    spark.stop()
  }
}
