package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Dedup

/** The fused MinHashSignature expression must be bit-identical to the
  * column-composed form it replaced (array_min over 64 transform
  * passes), including the all-null signature of an empty hash array.
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
    assert(both.filter(col("fused") =!= col("ref")).isEmpty)
    assert(both.count() > 0)
  }

  test("empty hash array yields an all-null signature like the composed form") {
    val df = Seq(Seq.empty[Long], Seq(7L)).toDF("hh")
    val got = df.select(
      Dedup.minhashSignatureFromHashes(col("hh"), 4).as("fused"),
      composed(col("hh"), 4).as("ref"))
      .as[(Seq[Option[Long]], Seq[Option[Long]])].collect()
    got.foreach { case (fused, ref) => assert(fused === ref) }
    assert(got(0)._1 === Seq(None, None, None, None))
  }
}
