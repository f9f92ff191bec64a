package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when
  * SQL-expressible) the DuckDB oracle the driver replays at sf0.01.
  * `oracle = None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
