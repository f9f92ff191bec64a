package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Testdata schema canary: pins the dtypes `Tables` hands to every
  * downstream operator. When the driver regenerates /root/testdata
  * with a different physical encoding (round 8: events.ts flipped
  * INT64-nanos → TIMESTAMP(MICROS) and silently broke 36 queries and
  * 52 tests), this spec fails with ONE message naming the drifted
  * column instead of dozens of cryptic analysis errors downstream.
  *
  * The contract is the POST-loader schema: events.ts must arrive as
  * TimestampType (the loader normalizes both historical encodings);
  * orders/lineitem date columns load as TIMESTAMP_NTZ and every
  * consumer was certified against that.
  */
class TablesSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  test("every loaded table matches the dtype contract") {
    val drifted = Tables.all.flatMap { name =>
      val got = Tables.table(spark, sf, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      if (got == want) None
      else Some(s"$name: expected $want, loaded $got")
    }
    assert(drifted.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — the driver regenerated parquet with " +
        s"new dtypes; fix sources/Tables.scala loaders first:\n" +
        drifted.mkString("\n"))
  }

  test("events.ts is usable by unix_micros (the downstream contract)") {
    import org.apache.spark.sql.functions._
    val n = Tables.events(spark, sf)
      .select(unix_micros(col("ts"))).filter(col("unix_micros(ts)").isNotNull)
      .count()
    assert(n > 0)
  }
}
