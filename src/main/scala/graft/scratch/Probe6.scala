package graft.scratch

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.datapipe.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev-only probe: ngram pair cost, repeated, after the hh persist. */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = {
      val base = Tables.documents(spark, d).select(col("doc_id").as("id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism)
      val toks = split(TextAnalysis.normalize(col("text")), " ")
      val truncated = array_join(slice(toks, lit(1), size(toks) - 1), " ")
      base.unionByName(base.select((col("id") + 1000000).as("id"), truncated.as("text")))
    }
    time("warmup") { docs.write.format("noop").mode("overwrite").save() }
    time("ngram run 1") {
      Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    time("ngram run 2") {
      Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash run 1") {
      Dedup.minhashPairs(docs, "id", "text", 64, 32, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
