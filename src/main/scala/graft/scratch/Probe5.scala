package graft.scratch

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.datapipe.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev-only probe: stage-by-stage cost of the simhash pair join. */
object Probe5 {
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
    val codes = docs
      .select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("id"), Dedup.shingleHashes(col("sh")).as("hh"))
      .select(col("id"), Dedup.simhashFromHashes(col("hh")).as("code"))

    time("warmup codes") { codes.write.format("noop").mode("overwrite").save() }

    val buckets = codes.select(col("id"), col("code"),
      explode(Dedup.simhashBands(col("code"), 8)).as("bb"))
    time("buckets explode") { buckets.write.format("noop").mode("overwrite").save() }

    val joined = buckets
      .select(col("bb"), col("id").as("a_id"), col("code").as("a_code"))
      .hint("shuffle_hash")
      .join(buckets.select(col("bb"), col("id").as("b_id"), col("code").as("b_code")),
        Seq("bb"))
      .filter(col("a_id") < col("b_id"))
    time("band join (pre-distinct)") {
      println("[probe] joined rows: " + joined.count())
    }

    val pairs = joined
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_code").bitwiseXOR(col("b_code"))).as("hamming"))
      .filter(col("hamming") <= 7)
      .distinct()
    time("full pairs") { pairs.write.format("noop").mode("overwrite").save() }
    println("[probe] final plan:\n" +
      pairs.queryExecution.executedPlan.toString.take(4000))

    spark.stop()
  }
}
