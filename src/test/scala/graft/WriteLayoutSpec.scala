package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Write-layout contracts: hive-partitioned output prunes at the scan
  * (PartitionFilters), and the engine round-trips through the other
  * interchange formats (CSV/JSON) with explicit schemas — the
  * source-format surface a pipeline needs around the parquet core.
  */
class WriteLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.sources.Tables.events(spark, sf)

  test("partitionBy layout prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_type#\\d+ = click".r
      .findFirstIn(plan).isDefined,
      s"no partition pruning; plan:\n${plan.take(1200)}")
    val expected = events.filter(col("event_type") === "click").count()
    assert(read.count() === expected)
  }

  test("CSV and JSON round-trip the events table with explicit schemas") {
    val base = events.select(col("event_id"), col("user_id"),
      col("event_type"), col("value"))
    val csvDir = Files.createTempDirectory("graft-csv").toString
    val jsonDir = Files.createTempDirectory("graft-json").toString
    base.write.mode("overwrite").option("header", "true").csv(csvDir)
    base.write.mode("overwrite").json(jsonDir)
    val fromCsv = spark.read.schema(base.schema)
      .option("header", "true").csv(csvDir)
    val fromJson = spark.read.schema(base.schema).json(jsonDir)
    val key = Seq("event_id")
    assert(fromCsv.count() === base.count())
    assert(fromJson.count() === base.count())
    assert(fromCsv.join(base, key).filter(
      fromCsv("value") =!= base("value")).count() === 0)
    assert(fromJson.join(base, key).filter(
      fromJson("event_type") =!= base("event_type")).count() === 0)
  }

  test("sharded writeout: one directory and one file per shard, " +
    "rows intact, and each file stores its shard in epoch order") {
    import graft.datapipe.{Layout, ShuffleOrder, TextAnalysis}
    val docs = graft.sources.Tables.documents(spark, sf)
    val assigned = ShuffleOrder.shardAssign(docs, col("doc_id"),
      TextAnalysis.tokenCount(col("text")), nShards = 4)
    val payload = assigned.join(docs.select(col("doc_id"), col("source")),
      Seq("doc_id"))
    val dir = Files.createTempDirectory("graft-shards").toString
    Layout.writeSharded(payload, dir, "shard_id",
      Seq(col("global_start")))
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(dirs.toSeq === (0 until 4).map(i => s"shard_id=$i"))
    // one data file per shard — the one-exchange-one-file contract
    for (sd <- dirs) {
      val files = new java.io.File(s"$dir/$sd").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"$sd has ${files.length} files")
      // within the file, rows are stored in epoch order
      val starts = spark.read.parquet(files.head.toString)
        .select("global_start").collect().map(_.getLong(0))
      assert(starts.toSeq === starts.sorted.toSeq, s"$sd out of order")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() === payload.count())
    // partition column round-trips the assignment exactly
    val mismatch = back.select(col("doc_id"), col("shard_id").cast("long"))
      .exceptAll(payload.select(col("doc_id"), col("shard_id")))
    assert(mismatch.isEmpty)
  }

  test("ORC round-trips the full events table including timestamps") {
    val dir = Files.createTempDirectory("graft-orc").toString
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === events.count())
    // exact row equality both directions (timestamps survive)
    assert(back.exceptAll(events).isEmpty)
    assert(events.exceptAll(back).isEmpty)
  }
}
