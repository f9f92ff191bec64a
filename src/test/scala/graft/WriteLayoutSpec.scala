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
