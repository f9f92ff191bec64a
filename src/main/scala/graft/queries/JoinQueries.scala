package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Joins
import graft.sources.Tables

/** Temporal/interval join entries. Both oracles are native DuckDB
  * join forms (ASOF JOIN / inequality join), so the Spark
  * compositions are checked against independent reference
  * implementations, not restatements of themselves.
  */
object JoinQueries {

  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  /** Credential-dim updates, 3 per customer at deterministic hours —
    * the "state of the dim when the trade happened" as-of lookup. */
  private val qAsofJoin = QueryDef(
    "q_asof_join",
    (s, d) => {
      val updates = Tables.customer(s, d)
        .select(col("c_custkey"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("k"))
        .select(col("c_custkey").as("user_id"),
          (lit(BaseUs) + ((col("c_custkey") % 97) + (col("k") - 1) * 173)
            * 3600000000L).as("uts_us"),
          concat(lit("tier"), (col("c_custkey") + col("k")) % 3).as("status"))
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      Joins.asOfJoin(ev, updates, "user_id", "ts_us", "uts_us",
        Seq("status", "uts_us"))
        .select(col("event_id"), col("status"), col("uts_us").as("asof_ts_us"))
    },
    Some(s"""WITH upd AS (
        SELECT c_custkey AS user_id,
          $BaseUs + ((c_custkey % 97) + (k - 1) * 173) * 3600000000 AS uts_us,
          'tier' || ((c_custkey + k) % 3) AS status
        FROM customer, UNNEST([1, 2, 3]) AS t(k)),
      ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
      SELECT event_id, status, uts_us AS asof_ts_us
      FROM ev ASOF LEFT JOIN upd
        ON ev.user_id = upd.user_id AND ev.ts_us >= upd.uts_us"""))

  /** Events landing inside per-customer 2h maintenance windows —
    * point-in-interval via the bucketed equi-join. */
  private val qRangeJoin = QueryDef(
    "q_range_join",
    (s, d) => {
      val windows = Tables.customer(s, d).select(col("c_custkey"),
        (lit(BaseUs) + (col("c_custkey") % 240) * 3600000000L).as("w_lo"))
        .withColumn("w_hi", col("w_lo") + 7200000000L)
      val pts = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      Joins.bucketedRangeJoin(pts, "ts_us", windows, "w_lo", "w_hi",
        bucketWidth = 7200000000L)
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_events_in_window"))
    },
    Some(s"""WITH w AS (SELECT c_custkey,
        $BaseUs + (c_custkey % 240) * 3600000000 AS w_lo,
        $BaseUs + (c_custkey % 240) * 3600000000 + 7200000000 AS w_hi
      FROM customer)
      SELECT c_custkey, COUNT(*) AS n_events_in_window
      FROM events e JOIN w
        ON epoch_us(e.ts) >= w.w_lo AND epoch_us(e.ts) < w.w_hi
      GROUP BY c_custkey"""))

  val defs: Seq[QueryDef] = Seq(qAsofJoin, qRangeJoin)
}
