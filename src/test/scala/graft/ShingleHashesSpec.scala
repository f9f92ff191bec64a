package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Dedup

/** The fused shingle-hash expression must produce bit-identical longs
  * to the composed shingles→xxhash64 pipeline it replaces — same
  * values, same first-occurrence order — across corpus text, window
  * sizes, short documents, degenerate strings, and nulls.
  */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def composed(text: org.apache.spark.sql.Column, k: Int) =
    Dedup.shingleHashes(Dedup.shingles(text, k))

  test("fused equals composed on corpus text for several k") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (k <- Seq(1, 3, 5)) {
      val both = docs.select(
        Dedup.hashedShingles(col("text"), k).as("fused"),
        composed(col("text"), k).as("ref"))
      assert(both.filter(!(col("fused") <=> col("ref"))).isEmpty, s"k=$k")
    }
  }

  test("fused equals composed on degenerate shapes") {
    val df = Seq(
      Some("one two"),            // fewer tokens than k=3
      Some("a"),                  // single token
      Some(""),                   // empty string
      Some("  padded   spaces "), // normalization collapses
      Some("dup dup dup dup"),    // duplicate windows collapse
      None                        // null text
    ).toDF("text")
    val both = df.select(
      Dedup.hashedShingles(col("text"), 3).as("fused"),
      composed(col("text"), 3).as("ref"))
    assert(both.filter(!(col("fused") <=> col("ref"))).isEmpty)
    // and the null row really is null on both sides
    assert(both.filter(col("fused").isNull && col("ref").isNull).count() === 1)
  }
}
