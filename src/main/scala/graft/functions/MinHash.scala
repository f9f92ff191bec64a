package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature: fold an array of pre-hashed shingles
  * (array<bigint>) into `numHashes` permutation minima in ONE pass.
  *
  * Bit-compatible with the column-composed form
  * `array((0 until n).map(i => array_min(transform(hh, h =>
  * xxhash64(lit(i), h)))))` — INCLUDING its null semantics, which
  * follow from how Spark's XxHash64 folds children left from seed 42
  * and skips null inputs:
  *  - a null ELEMENT hashes to the permutation seed itself
  *    (`xxhash64(lit(i), null)` = `hashInt(i, 42)`), so it still
  *    competes for the minimum;
  *  - a null or empty ARRAY yields an array of `numHashes` nulls
  *    (`array_min` of a null/empty array is null, and the outer
  *    `array(...)` is itself never null) — so this expression is
  *    non-nullable.
  *
  * The composed form traverses the hash array once PER PERMUTATION
  * (64 `transform` passes, each allocating an intermediate array);
  * this expression is a single fused loop with one long[] of state,
  * the same technique as [[SimHash64]] and [[CosineSimilarity]].
  * MinHashSpec pins the equivalence on corpus text and on every
  * degenerate shape above.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<bigint>, got ${other.catalogString}")
    }

  // xxhash64(lit(i), h) = hashLong(h, seed_i), seed_i = hashInt(i, 42)
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(new Array[Any](numHashes))
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        // null element → candidate value is the permutation seed
        var i = 0
        while (i < numHashes) {
          if (seeds(i) < mins(i)) mins(i) = seeds(i)
          i += 1
        }
      } else {
        val h = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v2 = XXH64.hashLong(h, seeds(i))
          if (v2 < mins(i)) mins(i) = v2
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    val n = ctx.freshName("n")
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    val arrData = classOf[ArrayData].getName
    val resultCode =
      code"""
        ${childGen.code}
        $arrData ${ev.value};
        if (${childGen.isNull} || ${childGen.value}.numElements() == 0) {
          ${ev.value} = new $gad(new Object[$numHashes]);
        } else {
          int $n = ${childGen.value}.numElements();
          long[] $mins = new long[$numHashes];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $j = 0; $j < $n; $j++) {
            if (${childGen.value}.isNullAt($j)) {
              for (int $i = 0; $i < $numHashes; $i++) {
                if ($seedsRef[$i] < $mins[$i]) $mins[$i] = $seedsRef[$i];
              }
            } else {
              long $h = ${childGen.value}.getLong($j);
              for (int $i = 0; $i < $numHashes; $i++) {
                long $v = $xxh.hashLong($h, $seedsRef[$i]);
                if ($v < $mins[$i]) $mins[$i] = $v;
              }
            }
          }
          ${ev.value} = new $gad($mins);
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashFunctions {
  /** minhash_signature(hashes, n) over an array<bigint> column of
    * per-shingle hashes (see [[graft.datapipe.Dedup.shingleHashes]]). */
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), numHashes))
}
