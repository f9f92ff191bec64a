package graft.scratch

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.datapipe.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev-only probe: simhash band-bucket skew + twin hamming distances. */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"

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

    for (bands <- Seq(8, 4)) {
      val hist = codes.select(explode(Dedup.simhashBands(col("code"), bands)).as("bb"))
        .groupBy(col("bb")).count().agg(
          count(lit(1)).as("n_buckets"), max("count").as("max_sz"),
          expr("percentile(count, 0.99)").as("p99"),
          sum(col("count") * col("count")).as("sum_sq"))
      println(s"[probe] bands=$bands: " + hist.collect().mkString)
    }

    val twins = codes.filter(col("id") < 1000000).alias("a")
      .join(codes.filter(col("id") >= 1000000).alias("b"),
        col("a.id") === col("b.id") - 1000000)
      .select(bit_count(col("a.code").bitwiseXOR(col("b.code"))).as("h"))
    println("[probe] twin hamming: " + twins.groupBy("h").count()
      .orderBy("h").collect().mkString(" "))

    spark.stop()
  }
}
