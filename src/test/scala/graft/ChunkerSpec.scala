package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Chunker

/** Content-defined chunking: lossless reassembly, length bounds, and
  * the property that justifies its existence — boundary
  * RESYNCHRONIZATION after a prefix edit, which fixed-size splitting
  * cannot provide.
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text")).limit(100)

  test("chunks reassemble byte-exactly and respect length bounds") {
    docs.as[(Long, String)].collect().foreach { case (_, text) =>
      val cs = Chunker.chunksOf(text)
      assert(cs.mkString === text)
      // every chunk except possibly the last respects min/max
      cs.dropRight(1).foreach { c =>
        val n = c.getBytes("UTF-8").length
        assert(n >= 32 && n <= 512, s"chunk of $n bytes out of bounds")
      }
    }
  }

  test("boundaries resynchronize after a prefix edit") {
    // repeat each doc to guarantee multi-chunk length
    val texts = docs.as[(Long, String)].collect().map(_._2)
      .map(t => (t + " ") * 5)
      .filter(_.getBytes("UTF-8").length > 600)
    assert(texts.nonEmpty)
    val resyncRatios = texts.map { text =>
      val orig = Chunker.chunksOf(text).map(c => c.hashCode).toSet
      val edited = Chunker.chunksOf("EDIT-PREFIX " + text).map(_.hashCode).toSet
      orig.intersect(edited).size.toDouble / orig.size
    }
    // most chunks survive the edit in most documents
    assert(resyncRatios.count(_ >= 0.5).toDouble / resyncRatios.length >= 0.8,
      s"resync ratios too low: ${resyncRatios.take(10).mkString(",")}")
  }

  test("chunk table distributes and keys duplicate passages together") {
    val twins = docs.unionByName(
      docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val chunks = Chunker.chunkTable(spark, twins)
    // exact twins share every chunk hash: each chunk_md5 appears an
    // even number of times
    val odd = chunks.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") % 2 =!= 0)
    assert(odd.count() === 0)
  }
}
