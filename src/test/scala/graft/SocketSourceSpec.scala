package graft

import java.io.{OutputStreamWriter, PrintWriter}
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** S1's last inch beyond the rate-source replay: the hot path
  * consuming a GENUINELY EXTERNAL unbounded endpoint — a real TCP
  * server (`java.net.ServerSocket`, loopback, zero egress) serving
  * the exact WS frame stream [[Streams.wsFrameJson]] generates, read
  * through Spark's `socket` source. Where `WsReplaySpec` certifies
  * the semantics on an in-engine unbounded source, this suite
  * certifies the engine actually drives an out-of-process byte
  * stream: connection handling, line framing, and the same
  * parse→sign→Avro→verify composition, checked row-for-row against
  * the batch twin. A production deployment swaps the socket
  * connector for the Finnhub WS client (finnhub.go:59-169) — the
  * read loop this server stands in for — and changes nothing
  * downstream.
  */
class SocketSourceSpec extends SparkSpec {

  private def hotPath(frames: DataFrame): DataFrame =
    graft.ops.HotPath.perTradeReadout(spark, frames, "raw")

  private def rowKey(r: org.apache.spark.sql.Row): (String, Boolean, Option[Boolean], Long) =
    (r.getString(0), r.getBoolean(1),
      Option(r.get(2)).map(_.asInstanceOf[Boolean]), r.getLong(3))

  test("hot path over a real TCP socket source matches the batch twin " +
    "row-for-row (frames served by an external loopback server)") {
    val n = 120L
    // the frame stream the reference's WS read loop would deliver,
    // newline-framed (frames are single-line JSON by construction)
    val frames: Seq[String] = Streams.wsReplayBatch(spark, n)
      .orderBy(col("seq")).collect().map(_.getString(1)).toSeq

    val server = new ServerSocket(0, 1, InetAddress.getByName("127.0.0.1"))
    @volatile var serveErr: Option[Throwable] = None
    val serverThread = new Thread(() => {
      try {
        val sock = server.accept()
        val w = new PrintWriter(new OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8))
        frames.foreach(w.println)
        w.flush()
        // hold the connection open until the test closes the server —
        // the socket source treats a peer close as end-of-stream
        // handling we don't want racing the assertion window
        while (!server.isClosed) Thread.sleep(50)
        sock.close()
      } catch { case e: Throwable => serveErr = Some(e) }
    }, "ws-frame-server")
    serverThread.setDaemon(true)
    serverThread.start()

    val stream = spark.readStream.format("socket")
      .option("host", "127.0.0.1")
      .option("port", server.getLocalPort.toLong)
      .load()
      .select(col("value").as("raw"))
    assert(stream.isStreaming, "socket source must be unbounded")

    val want = hotPath(Streams.wsReplayBatch(spark, n)).collect()
    assert(want.nonEmpty, "batch twin fixture must produce trades")

    val q = hotPath(stream)
      .writeStream.format("memory").queryName("socket_hot")
      .outputMode(OutputMode.Append).start()
    try {
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("socket_hot").count() < want.length &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      q.processAllAvailable()
    } finally {
      q.stop()
      server.close()
    }
    assert(serveErr.isEmpty, s"frame server died: $serveErr")

    val got = spark.table("socket_hot").collect()
    assert(got.map(rowKey).toSet === want.map(rowKey).toSet,
      "stream rows over the socket != batch twin rows")
    assert(got.length === want.length,
      "row multiplicity differs (lost or duplicated frames)")
  }
}
