package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns.
  *
  * Why an Expression and not a UDF or `aggregate(zip_with(...))`:
  * the brute-force ANN path evaluates this once per (query,
  * candidate) pair — at 100 TB that's the innermost loop of the
  * engine. A custom BinaryExpression with `doGenCode` emits a single
  * fused Java loop (one pass: dot + both norms) that stays inside
  * whole-stage codegen; the zip_with/aggregate composition allocates
  * an intermediate array per row, and a Scala UDF adds
  * serialization. Deterministic left-to-right accumulation also
  * keeps results bit-identical across engines and runs.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Pack an `array<long>` of values in [-128, 127] into a BinaryType
  * row of signed bytes — the storage form of the scalar-quantized ANN
  * tier ([[graft.datapipe.Similarity.sq8TopK]]). An array<long> code
  * vector costs 8 bytes per component plus array headers; the packed
  * form is 1 byte per component, which is the whole point of SQ8 —
  * the stage-1 scan's memory traffic drops 8×. Out-of-range input
  * throws: silent truncation would corrupt scores undetectably.
  */
case class PackSignedBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_signed_bytes"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i))
        throw new IllegalArgumentException(
          s"pack_signed_bytes: null element at index $i — a null code " +
            "component has no byte representation")
      val v = x.getLong(i)
      if (v < -128L || v > 127L)
        throw new IllegalArgumentException(
          s"pack_signed_bytes: $v at index $i is outside [-128, 127]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        byte[] $out = new byte[$n];
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) {
            throw new IllegalArgumentException(
              "pack_signed_bytes: null element at index " + $i);
          }
          long $v = $a.getLong($i);
          if ($v < -128L || $v > 127L) {
            throw new IllegalArgumentException(
              "pack_signed_bytes: value at index " + $i +
              " is outside [-128, 127]");
          }
          $out[$i] = (byte) $v;
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): PackSignedBytes = copy(child = newChild)
}

/** Fused integer dot product over two packed signed-byte columns —
  * the stage-1 scoring kernel of SQ8. Same rationale as
  * [[CosineSimilarity]]: this runs once per (query, candidate) pair,
  * so it must be one codegen'd loop over primitive bytes with no
  * intermediate allocation. Integer accumulation is exact, hence
  * order-portable across engines. Mismatched code lengths throw —
  * a truncated dot product would rank candidates plausibly but
  * wrongly, the same silent corruption [[PackSignedBytes]] guards
  * against.
  */
case class ByteDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"byte_dot_product: code lengths differ (${x.length} vs ${y.length})")
    var dot = 0L; var i = 0
    while (i < x.length) { dot += x(i).toLong * y(i).toLong; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        if ($a.length != $b.length) {
          throw new IllegalArgumentException(
            "byte_dot_product: code lengths differ (" + $a.length +
            " vs " + $b.length + ")");
        }
        long $dot = 0L;
        for (int $i = 0; $i < $a.length; $i++) {
          $dot += ((long) $a[$i]) * ((long) $b[$i]);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** cosine_similarity(a, b) over array<double> columns. Inputs are
    * cast explicitly (the expression assumes double arrays). */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** pack_signed_bytes(a): array<long> in [-128,127] → binary. */
  def packSignedBytes(a: Column): Column =
    ColumnBridge.column(PackSignedBytes(
      ColumnBridge.expression(a.cast("array<long>"))))

  /** byte_dot_product(a, b) over packed signed-byte binary columns. */
  def byteDotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(ByteDotProduct(
      ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
