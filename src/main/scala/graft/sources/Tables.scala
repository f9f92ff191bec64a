package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The only non-trivial bit: `events.ts` is written as parquet
  * INT64 TIMESTAMP(NANOS) which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (ts arrives as Long
  * nanos) and convert to TimestampType (microsecond precision —
  * the data is microsecond-aligned, so no precision is lost).
  *
  * All loaders are thin: column pruning + filter pushdown stay with
  * Catalyst; at 100 TB the parquet scan must receive PushedFilters,
  * so no eager caching or materialization happens here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(dir, name))
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(path(dir, name))
    }
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
