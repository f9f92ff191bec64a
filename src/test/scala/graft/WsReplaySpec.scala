package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.EventOps
import graft.streaming.Streams

/** S1 live-source fidelity: the reference's hot path
  * (finnhub.go:59-169 read loop → sign → Kafka → verify → Q1) run as
  * ONE Structured Streaming query from a genuinely unbounded
  * rate-driven WS-frame source — not a MemoryStream fixture — and
  * checked row-for-row against the batch twin over the exact seq
  * interval the stream actually committed. Closes the by-design S1
  * gap at the semantics level: a deployment swaps the rate source
  * for a socket connector and changes nothing downstream.
  */
class WsReplaySpec extends SparkSpec {
  import spark.implicits._

  /** The e2e hot path — [[graft.ops.HotPath.perTradeReadout]], the
    * SAME composition the `e2e_hot_path` catalog entry aggregates:
    * P1/P3/P4 WS parse → P2 default-fill → P5 envelope + U1 REAL
    * signing → K2/S3 binary Avro egress+ingress → U2 verify. Pure
    * `DataFrame => DataFrame`, so the stream and the batch twin
    * share it verbatim.
    */
  private def hotPath(frames: DataFrame): DataFrame =
    graft.ops.HotPath.perTradeReadout(spark, frames, "raw")

  private def rowKey(r: org.apache.spark.sql.Row): (String, Boolean, Option[Boolean], Long) =
    (r.getString(0), r.getBoolean(1),
      Option(r.get(2)).map(_.asInstanceOf[Boolean]), r.getLong(3))

  test("S1 replay: live rate-source WS frames through parse→sign→verify→q1 " +
    "match the batch twin on the committed interval") {
    val stream = Streams.wsReplayStream(spark, rowsPerSecond = 2000,
      numPartitions = 4)
    val q = hotPath(stream)
      .writeStream.format("memory").queryName("ws_replay")
      .outputMode(OutputMode.Append).start()
    try {
      // let the unbounded source commit at least one non-empty batch
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("ws_replay").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ws_replay").collect()
    assert(got.nonEmpty, "rate source committed no trade rows within 60 s")

    // recover the committed seq interval: t is base + 3·seq + i
    val k = got.map(r =>
      (r.getAs[Long]("t_ms") - Streams.WsReplayEpochMs) / 3).max + 1
    val want = hotPath(Streams.wsReplayBatch(spark, k)).collect()
    // trailing ping frames past the last trade frame emit no rows on
    // either side, so the interval [0, k) captures exactly the
    // stream's observable output
    assert(got.map(rowKey).toSet === want.map(rowKey).toSet,
      s"stream rows != batch twin rows over seq [0, $k)")
    assert(got.length === want.length,
      "row multiplicity differs (duplicate emission in the stream)")

    // Q1 readout equality: same p95 + counters per symbol from both
    def q1(df: DataFrame): Map[String, (Long, Long, Long, Double)] =
      graft.ops.HotPath.q1Aggregate(df)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
    assert(q1(spark.table("ws_replay")) ===
      q1(hotPath(Streams.wsReplayBatch(spark, k))))
  }

  test("frame generator: ping cadence, trade batching, and determinism") {
    val frames = Streams.wsReplayBatch(spark, 40).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(frames(9) === """{"type":"ping"}""" &&
      frames(19) === """{"type":"ping"}""", "every 10th frame is a ping")
    assert(frames(0).contains("\"type\":\"trade\""))
    // seq 1 → 1-3 trades per the seq % 3 + 1 rule
    val parsed = EventOps.parseWsFrames(
      Streams.wsReplayBatch(spark, 40), "raw").collect()
    val perFrame = parsed.groupBy(r =>
      (r.getAs[Long]("Event_Timestamp") - Streams.WsReplayEpochMs) / 3)
    assert((0L until 40L).filter(_ % 10 != 9).forall(s =>
      perFrame(s).length == (s % 3 + 1).toInt),
      "trade count per frame follows seq % 3 + 1")
    // determinism: a second build is byte-identical
    val again = Streams.wsReplayBatch(spark, 40).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === frames)
  }
}
