package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Dedup

/** The fused MinHashSignature expression must be bit-identical to the
  * column-composed form it replaced (array_min over 64 transform
  * passes) on corpus text AND on every degenerate shape: empty
  * arrays, null arrays, and null elements (which the composed form
  * hashes to the permutation seed via xxhash64's null-skipping fold).
  */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def composed(hashCol: org.apache.spark.sql.Column, n: Int) =
    array((0 until n).map { i =>
      array_min(transform(hashCol, h => xxhash64(lit(i), h)))
    }: _*)

  test("fused signature equals the composed form on corpus text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Dedup.shingleHashes(
        Dedup.shingles(col("text"), 3)).as("hh"))
    val both = docs.select(col("doc_id"),
      Dedup.minhashSignatureFromHashes(col("hh"), 64).as("fused"),
      composed(col("hh"), 64).as("ref"))
    // null-safe comparison: =!= would silently drop any null-bearing row
    assert(both.filter(!(col("fused") <=> col("ref"))).isEmpty)
    assert(both.count() > 0)
  }

  test("empty, null, and null-element arrays match the composed form") {
    val df = Seq(
      Some(Seq(Some(7L), Some(8L))),
      Some(Seq.empty[Option[Long]]),
      None, // null array (e.g. null text upstream)
      Some(Seq(Some(7L), None)), // null element competes as the seed
      Some(Seq[Option[Long]](None))
    ).toDF("hh")
    val got = df.select(
      Dedup.minhashSignatureFromHashes(col("hh"), 4).as("fused"),
      composed(col("hh"), 4).as("ref"))
    assert(got.filter(!(col("fused") <=> col("ref"))).isEmpty)
    val rows = got.as[(Seq[Option[Long]], Seq[Option[Long]])].collect()
    assert(rows(1)._1 === Seq(None, None, None, None))
    assert(rows(2)._1 === Seq(None, None, None, None))
    assert(rows(4)._1.forall(_.isDefined), "all-null input still yields seed minima")
  }
}
