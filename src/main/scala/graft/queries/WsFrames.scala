package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Shared fixture: events serialized as the reference's WebSocket
  * frame JSON (`{"type":"trade","data":[{c,p,s,t,v}]}`, every 50th a
  * ping). BOTH p1_ws_frames and e2e_hot_path parse this stream and
  * their oracles assume the same construction — one builder keeps
  * them in lockstep.
  */
private[queries] object WsFrames {

  def frames(s: SparkSession, d: String): DataFrame = {
    val wsTrade = struct(
      when(col("event_type").isNull || col("event_type") === "",
        lit(null).cast("array<string>"))
        .otherwise(array(col("event_type"))).as("c"),
      col("value").as("p"),
      concat(lit("SYM"), col("user_id") % 7).as("s"),
      expr("unix_micros(ts) DIV 1000").as("t"),
      get_json_object(col("props"), "$.k").cast("double").as("v"))
    Tables.events(s, d).select(
      when(col("event_id") % 50 === 0, lit("""{"type":"ping"}"""))
        .otherwise(to_json(struct(lit("trade").as("type"),
          array(wsTrade).as("data")))).as("raw"))
  }
}
