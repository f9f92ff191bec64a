package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All prefix sums-of-squares of a quantized vector in ONE pass —
  * the fused form of the matryoshka truncation profile's per-(row,
  * width) folds ([[graft.datapipe.Similarity.truncationProfile]],
  * Kusupati et al. 2022, arXiv:2205.13147).
  *
  * The Column composition this replaces evaluated an interpreted
  * `aggregate(transform(...))` HOF pair TWICE per (vector, width) —
  * |dims|·(full + prefix) array walks per row, none of it codegen'd
  * (the r13 SCALE wave read exponent 0.38, the highest of its wave,
  * pure interpreted-fold CPU). As a single expression the vector is
  * walked ONCE: each element's square accumulates into a running
  * long, checkpointed at every requested prefix width — O(n + k)
  * per row, inside whole-stage codegen (the
  * [[graft.functions.WinnowSelect]] treatment; that precedent
  * measured 30×).
  *
  * Output layout (array<bigint>, length |dims| + 2):
  *   [0] n — the vector's element count;
  *   [1] Σ x_i² over the WHOLE vector;
  *   [2+j] Σ_{i ≤ dims(j)} x_i² for each requested width, in the
  *         caller's (sorted) dims order; a width past the end reads
  *         the full sum (exactly what `slice` past the end folded).
  * NULL elements contribute 0 to every sum (the HOF form's `x * x`
  * on a null element folded null into the sum making the whole sum
  * NULL — but quantize never emits null elements; this expression
  * keeps the sums total rather than poisoning them). NULL input →
  * NULL output.
  *
  * Overflow: |x| ≤ ~2.1e6 after quantize's ×1000 scaling of unit-ish
  * floats would need n > 2e6 components to approach 2^63 — raw longs
  * are safe at any plausible dim; the multiply-add loop stays
  * primitive.
  */
case class NormPrefixSq(child: Expression, dims: Seq[Int])
    extends UnaryExpression {

  require(dims.nonEmpty && dims.forall(_ >= 1),
    s"prefix widths must be >= 1, got $dims")
  require(dims == dims.sorted && dims.distinct.size == dims.size,
    s"prefix widths must be strictly increasing, got $dims")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "norm_prefix_sq"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"norm_prefix_sq requires array<bigint>, got ${other.catalogString}")
    }

  @transient private lazy val dimsArr: Array[Int] = dims.toArray

  override def nullSafeEval(input: Any): Any =
    NormPrefixSq.compute(input.asInstanceOf[ArrayData], dimsArr)

  // one static call keeps the generated method tiny and the row
  // inside whole-stage codegen; the accumulation loop lives in
  // compute(). The dims literal is materialized once per operator as
  // a codegen reference, not rebuilt per row.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dimsRef = ctx.addReferenceObj("npsDims", dimsArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"${NormPrefixSq.getClass.getName.stripSuffix("$")}.compute($c, $dimsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormPrefixSq =
    copy(child = newChild)
}

object NormPrefixSq {

  /** Column form; `dims` must be sorted ascending and distinct. */
  def of(q: Column, dims: Seq[Int]): Column =
    ColumnBridge.column(NormPrefixSq(ColumnBridge.expression(q), dims))

  /** One multiply-add walk, checkpointing at each requested width;
    * called per row from generated code.
    */
  def compute(q: ArrayData, dims: Array[Int]): ArrayData = {
    val n = q.numElements()
    val out = new Array[Long](dims.length + 2)
    out(0) = n.toLong
    var acc = 0L
    var j = 0 // next checkpoint index into dims
    var i = 0
    while (i < n) {
      while (j < dims.length && dims(j) == i) { out(j + 2) = acc; j += 1 }
      if (!q.isNullAt(i)) {
        val v = q.getLong(i)
        acc += v * v
      }
      i += 1
    }
    out(1) = acc
    // widths at or past the end read the full sum (slice-past-end
    // semantics of the HOF form)
    while (j < dims.length) { out(j + 2) = acc; j += 1 }
    new GenericArrayData(out)
  }
}
