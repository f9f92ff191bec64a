package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: sliding word 3-grams, distinct") {
    val out = Seq("a b c d", "x y").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0).toSet == Set("a b c", "b c d"))
    assert(out(1) == Seq("x y"), "short doc → whole text as one shingle")
  }

  test("exact groups collapse whitespace/case variants") {
    val docs = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs, col("text"), col("doc_id"))
      .orderBy("keeper_doc_id").collect()
    assert(groups.length == 2)
    assert(groups(0).getLong(1) == 1L && groups(0).getLong(2) == 2L)
  }

  test("minhash LSH finds the planted near-duplicates and jaccard is exact") {
    val base = (0L until 20L).map(i =>
      (i, (0 to 30).map(j => s"w${(i * 31 + j) % 97}").mkString(" ")))
    // twin of doc 0 with one word changed → high jaccard
    val twin = (100L, base(0)._2.replaceFirst("w0", "zz"))
    val docs = (base :+ twin).toDF("id", "text")
    val pairs = Dedup.minhashPairs(docs, "id", "text",
      numHashes = 64, bands = 16, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((0L, 100L)))
    // jaccard reported must be the exact shingle-set jaccard
    val j = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 100L).get.getDouble(2)
    val shA = base(0)._2.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val shB = twin._2.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val exact = shA.intersect(shB).size.toDouble / shA.union(shB).size
    assert(math.abs(j - exact) < 1e-12)
  }

  test("simhash: identical docs share codes; different docs don't") {
    val codes = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"),
        (3L, "completely different words here now"))
      .toDF("id", "text")
      .select(Dedup.simhash(Dedup.shingles(col("text"), 3)).as("h"))
      .as[Long].collect()
    assert(codes(0) == codes(1) && codes(0) != codes(2))
  }

  test("normalize is idempotent") {
    val once = Seq("  A   b\tC ").toDF("t")
      .select(TextAnalysis.normalize(col("t"))).as[String].head()
    val twice = Seq(once).toDF("t")
      .select(TextAnalysis.normalize(col("t"))).as[String].head()
    assert(once == "a b c" && once == twice)
  }
}
