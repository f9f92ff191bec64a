package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise vector aggregates over quantized embedding arrays —
  * the partition-local accumulator shape for every corpus-sized
  * moment rollup in the embedding family (SURVEY.md §2.11 ANN/PCA
  * rows; the round-12 verdict's one efficiency flag).
  *
  * The posexplode formulation these replace materializes d (or d²
  * for the Gram) ROWS per vector through the hash aggregate: correct
  * and shuffle-bounded, but a ~d× (~d²×) constant-factor CPU cost on
  * the row-generation side — at fixture dim 64 it is invisible, at
  * production embedding dims (768–4096) it dominates. A typed
  * [[Aggregator]] instead folds each PARTITION into one primitive
  * long array (the MLlib `computeGramianMatrix` shape): per row a
  * tight d (d²) multiply-add loop, per partition ONE buffer, map-side
  * partial aggregation via ObjectHashAggregate, and the shuffle
  * carries d (d²) longs per partition per group — the same totals
  * the explode form shuffled, with none of its row fan-out.
  *
  * Arithmetic is IDENTICAL to the explode form: exact integer sums
  * over [[graft.datapipe.Similarity.quantize]]d components, order-
  * independent, so every oracle contract built on the explode
  * rollups survives the swap bit-for-bit (certified by unchanged
  * hashes across the rewrite at two SFs and by the dim-256/512 SCALE
  * wave).
  */
object VecAgg {

  private def seqLongEnc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  private def arrLongEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  /** Σ over rows of the input array, elementwise: array<bigint> →
    * array<bigint>. Empty input group → empty array. All input rows
    * must share one length (quantized embeddings do); a mismatch
    * fails loudly rather than truncating.
    */
  final class VecSumLong extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
      if (v == null) return buf
      val a = buf.length match {
        case 0 => new Array[Long](v.length)
        case n =>
          require(n == v.length,
            s"vecSum over ragged arrays: buffer dim $n vs row dim ${v.length}")
          buf
      }
      var i = 0
      val it = v.iterator
      while (it.hasNext) { a(i) += it.next(); i += 1 }
      a
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a.length == b.length,
          s"vecSum merge over ragged buffers: ${a.length} vs ${b.length}")
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    override def finish(buf: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)
    override def bufferEncoder: Encoder[Array[Long]] = arrLongEnc
    override def outputEncoder: Encoder[Seq[Long]] = seqLongEnc
  }

  /** The full second-moment state in ONE pass: count, component
    * sums, and the Gram (outer-product) sums, packed as
    * `[d, n, s(0..d-1), sp(0..d*d-1)]` (row-major sp). The covariance
    * then assembles driver-side as (n·sp_ij − s_i·s_j) in double —
    * the [[graft.datapipe.Similarity]] convention — from one
    * collected row of `d² + d + 2` longs.
    *
    * Long overflow headroom: |q| ≤ Q after quantize (×1000 of unit-
    * norm components → Q ≈ 10³), so each sp term is ≤ Q² ≈ 10⁶ and
    * the sum wraps only past ~9·10¹² rows — the same headroom the
    * explode form's BIGINT `sum()` had, now stated instead of
    * implied.
    */
  final class GramLong extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
      if (v == null) return buf
      val d = v.length
      val a = buf.length match {
        case 0 =>
          val b = new Array[Long](2 + d + d * d); b(0) = d; b
        case _ =>
          require(buf(0) == d,
            s"gram over ragged arrays: buffer dim ${buf(0)} vs row dim $d")
          buf
      }
      val row = new Array[Long](d)
      var i = 0
      val it = v.iterator
      while (it.hasNext) { row(i) = it.next(); i += 1 }
      a(1) += 1
      i = 0
      while (i < d) {
        val vi = row(i)
        a(2 + i) += vi
        val base = 2 + d + i * d
        var j = 0
        while (j < d) { a(base + j) += vi * row(j); j += 1 }
        i += 1
      }
      a
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a(0) == b(0),
          s"gram merge over ragged buffers: dim ${a(0)} vs ${b(0)}")
        var i = 1
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    override def finish(buf: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)
    override def bufferEncoder: Encoder[Array[Long]] = arrLongEnc
    override def outputEncoder: Encoder[Seq[Long]] = seqLongEnc
  }

  /** Column form: elementwise Σ of an array<bigint> column. */
  def vecSum(c: Column): Column = udaf(new VecSumLong, seqLongEnc)(c)

  /** Column form: packed (d, n, Σq, ΣqqT) of an array<bigint>
    * column — see [[GramLong]] for the layout.
    */
  def gram(c: Column): Column = udaf(new GramLong, seqLongEnc)(c)
}
