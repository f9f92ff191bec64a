package graft

import org.apache.spark.sql.functions._

import graft.functions.SortedIntersectCount

/** The merge-count must equal size(array_intersect) on sorted
  * distinct arrays — corpus-derived and hand-picked shapes.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("merge count equals array_intersect size on corpus shingle arrays") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        array_sort(graft.datapipe.Dedup.hashedShingles(col("text"), 3)).as("hh"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id")).limit(2000)
    val bad = pairs.select(
      SortedIntersectCount.column(col("a.hh"), col("b.hh")).as("merge"),
      size(array_intersect(col("a.hh"), col("b.hh"))).cast("bigint").as("ref"))
      .filter(col("merge") =!= col("ref"))
    assert(bad.isEmpty)
  }

  test("edge shapes: disjoint, identical, empty, containment") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
      (Seq.empty[Long], Seq(1L), 0L),
      (Seq(1L, 5L, 9L), Seq(5L), 1L),
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 6L, 7L, 8L), 2L))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(SortedIntersectCount.column(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(got === cases.map(_._3))
  }
}
