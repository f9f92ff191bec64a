package graft.scratch

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.datapipe.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev-only probe: where do dedup_simhash / dedup_minhash_lsh spend
  * their time at sf0.1, and does ReusedExchange fire on the
  * self-joins?
  */
object Probe3 {
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

    val codes = docs
      .select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("id"), Dedup.shingleHashes(col("sh")).as("hh"))
      .select(col("id"), Dedup.simhashFromHashes(col("hh")).as("code"))
    time("simhash codes only") { codes.write.format("noop").mode("overwrite").save() }

    val pairs = Dedup.simhashPairs(docs, "id", "text", 3, 8, 7)
    time("simhash pairs full") { pairs.write.format("noop").mode("overwrite").save() }
    val plan = pairs.queryExecution.executedPlan.toString
    println("[probe] simhash ReusedExchange in plan: " + plan.contains("ReusedExchange"))

    val hh = docs.select(col("id"),
      array_distinct(Dedup.shingleHashes(Dedup.shingles(col("text"), 3))).as("hh"))
    time("minhash hh only") { hh.write.format("noop").mode("overwrite").save() }
    val sig = hh.select(col("id"), Dedup.minhashSignatureFromHashes(col("hh"), 64).as("sig"))
    time("minhash hh+sig") { sig.write.format("noop").mode("overwrite").save() }

    val mp = Dedup.minhashPairs(docs, "id", "text", 64, 32, 0.8)
    time("minhash pairs full") { mp.write.format("noop").mode("overwrite").save() }
    val mplan = mp.queryExecution.executedPlan.toString
    println("[probe] minhash ReusedExchange in plan: " + mplan.contains("ReusedExchange"))

    spark.stop()
  }
}
