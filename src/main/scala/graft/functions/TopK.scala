package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** One (id, score) candidate flowing into a top-k aggregation. */
final case class ScoredItem(item: Long, score: Double)

/** Two-stage distributed top-k: each partition keeps a bounded
  * buffer per group (partial aggregation, map-side), the merge
  * combines buffers, and `finish` emits the k best sorted by
  * (score desc, item asc).
  *
  * This replaces `Window.partitionBy(q).orderBy(score)` + row_number
  * for per-query top-k: a window funnels every candidate row into one
  * reducer per query key — a hot-key bottleneck at scale — whereas
  * this aggregator's shuffle carries at most k rows per (partition,
  * group), independent of corpus size.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredItem, Seq[ScoredItem], Seq[ScoredItem]] {

  private def ord: Ordering[ScoredItem] =
    Ordering.by((s: ScoredItem) => (-s.score, s.item))

  private def trim(buf: Seq[ScoredItem]): Seq[ScoredItem] =
    buf.sorted(ord).take(k)

  override def zero: Seq[ScoredItem] = Vector.empty

  // Amortized: append cheaply, re-trim only when the buffer has grown
  // to 4k — so the per-row cost stays O(1) amortized, O(k log k) worst.
  override def reduce(b: Seq[ScoredItem], a: ScoredItem): Seq[ScoredItem] = {
    val appended = b :+ a
    if (appended.length >= 4 * k) trim(appended) else appended
  }

  override def merge(b1: Seq[ScoredItem], b2: Seq[ScoredItem]): Seq[ScoredItem] =
    trim(b1 ++ b2)

  override def finish(r: Seq[ScoredItem]): Seq[ScoredItem] = trim(r)

  override def bufferEncoder: ExpressionEncoder[Seq[ScoredItem]] =
    ExpressionEncoder[Seq[ScoredItem]]()
  override def outputEncoder: ExpressionEncoder[Seq[ScoredItem]] =
    ExpressionEncoder[Seq[ScoredItem]]()
}

object TopK {
  /** Column-callable top-k UDAF: `topK(k)(col("id"), col("score"))`
    * → array<struct<item,score>> sorted best-first.
    */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), ExpressionEncoder[ScoredItem]())
}
