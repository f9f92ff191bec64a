package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing selection (Schleimer et al. SIGMOD 2003) over a hash
  * array in ONE O(n) pass: the DISTINCT minima of every
  * `window`-wide sliding window, via a monotonic deque — the
  * expression form of [[graft.datapipe.Dedup.winnowing]]'s selection
  * step. The naive Column composition (`transform` of
  * `array_min(slice(...))`) is O(n·window) per row AND re-inlines
  * the child hash pipeline into every window under CollapseProject
  * (measured 30× end-to-end before staging); as a single expression
  * the child array is evaluated exactly once and the selection stays
  * inside whole-stage codegen with zero intermediate allocation
  * beyond the output — no staging table, so the operator also
  * deploys unchanged on a STREAM.
  *
  * Contract (mirrors the Column form and the DuckDB oracle):
  *  - n ≥ window: distinct min per full window, first-occurrence
  *    order;
  *  - 0 < n < window: the single global min (the ≥1-fingerprint
  *    guarantee);
  *  - n == 0: empty. NULL elements never win a window (treated as
  *    +∞); a window whose elements are ALL null emits nothing rather
  *    than fabricating the sentinel as a fingerprint. A genuine
  *    Long.MaxValue fingerprint is conflated with the sentinel and
  *    likewise skipped (probability 2^-64 for hash inputs).
  */
case class WinnowSelect(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be positive, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_select requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[ArrayData], window)

  // one static-call line keeps the generated method tiny and the row
  // inside whole-stage codegen; the deque loop lives in compute()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${WinnowSelect.getClass.getName.stripSuffix("$")}.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {

  /** Distinct sliding-window minima; called per row from generated
    * code. Monotonic deque of indices (values strictly increasing
    * front to back; ties evict the older index — robust winnowing's
    * rightmost-min, which the min-VALUE output makes observationally
    * identical to any other tie rule).
    */
  def compute(hashes: ArrayData, window: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      // a null element must never be selected: +∞ loses every min
      h(i) = if (hashes.isNullAt(i)) Long.MaxValue else hashes.getLong(i)
      i += 1
    }
    if (n < window) {
      var m = h(0)
      var j = 1
      while (j < n) { if (h(j) < m) m = h(j); j += 1 }
      // all elements null → the +∞ sentinel "won": there is no real
      // fingerprint to select, so the document contributes none
      // (rather than fabricating Long.MaxValue as a match key)
      return new GenericArrayData(
        if (m == Long.MaxValue) Array.emptyLongArray else Array(m))
    }
    val nw = n - window + 1
    // primitive open-addressing dedup set (the ShingleHashes sizing
    // contract: fail loudly past 2^29 candidate minima)
    require(nw < (1 << 29),
      s"$nw winnow windows in one document overflows the dedup table " +
        "sizing (max 2^29 - 1); split pathological giant documents upstream")
    var cap = 16
    while (cap < nw * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    val out = new Array[Long](nw)
    var m = 0
    // deque of indices over h, values increasing head→tail
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    while (j < n) {
      while (tail > head && h(dq(tail - 1)) >= h(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - window) head += 1
      if (j >= window - 1) {
        val v = h(dq(head))
        var fresh = false
        // v == MaxValue means EVERY element in this window was null
        // (the +∞ sentinel only wins an all-null window): emit nothing
        // — 'NULL elements never win a window' also covers the
        // degenerate window with no non-null candidate. A genuine
        // Long.MaxValue fingerprint is indistinguishable from the
        // sentinel and is likewise skipped (documented conflation;
        // 64-bit hash fingerprints hit it with probability 2^-64).
        if (v == Long.MaxValue) {
          // skip
        } else if (v == 0L) {
          if (!hasZero) { hasZero = true; fresh = true }
        } else {
          var slot = java.lang.Long.hashCode(v) & mask
          while (table(slot) != 0L && table(slot) != v)
            slot = (slot + 1) & mask
          if (table(slot) == 0L) { table(slot) = v; fresh = true }
        }
        if (fresh) { out(m) = v; m += 1 }
      }
      j += 1
    }
    new GenericArrayData(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** Column API: distinct `window`-wide sliding minima of a long
    * array. */
  def of(hashes: Column, window: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(hashes), window))
}
