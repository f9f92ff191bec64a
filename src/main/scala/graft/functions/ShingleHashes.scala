package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-shingle hashes straight from the token array, in ONE
  * pass with ZERO string allocation. The composed pipeline
  * (`shingleHashes(shingles(text, k))`) materializes every window as
  * its own string — `array_join` allocates |tokens| strings per
  * document — before hashing each once; this expression assembles
  * each window's bytes into a REUSED buffer and feeds them to the
  * same XXH64 the `xxhash64` expression uses, so the output longs are
  * bit-identical (ShingleHashesSpec pins it):
  *
  *  - window bytes = tokens joined by a single space, null tokens
  *    skipped exactly like `array_join`;
  *  - fewer than k tokens → one shingle of ALL tokens joined (the
  *    composed form's `when(size < k, ...)` branch);
  *  - distinct-by-hash in first-occurrence order ≡ the composed
  *    form's distinct-by-string then hash (collision-free at 64 bit —
  *    the assumption every verification join here already makes).
  *
  * This stage feeds every dedup operator (minhash, simhash, n-gram,
  * contamination, the streaming near-dup), which are the heaviest
  * queries in the bench — the hot path of the hot path.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"shingle size must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], k)

  // one static-call line keeps the generated method tiny and the row
  // inside whole-stage codegen; the heavy loop lives in compute()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${ShingleHashes.getClass.getName.stripSuffix("$")}.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Hash every k-window of the token array; called per row from
    * generated code. The assembly buffer is reused across windows
    * (grown geometrically when a window outsizes it).
    */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    var buf = new Array[Byte](64)

    def windowHash(from: Int, until: Int): Long = {
      var len = 0
      var first = true
      var j = from
      while (j < until) {
        val t = toks(j)
        if (t != null) { // array_join skips null elements
          val tb = t.numBytes()
          val need = len + tb + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(len) = ' '; len += 1 }
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
          len += tb
          first = false
        }
        j += 1
      }
      XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
    }

    if (n < k) return new GenericArrayData(Array(windowHash(0, n)))
    // primitive open-addressing dedup set (a java.util.HashSet would
    // box one Long + allocate one node per shingle — per document, on
    // the hottest path in the engine). 0 is a valid hash, so the
    // empty slot sentinel is a separate flag.
    val nw = n - k + 1
    // cap is the next power of two ≥ 2·nw; past 2^29 windows that
    // sizing overflows Int and the probe loop below would spin on a
    // full 16-slot table forever — fail loudly instead (a single
    // document with half a billion tokens should be split upstream).
    require(nw < (1 << 29),
      s"$nw shingle windows in one document overflows the dedup table " +
        "sizing (max 2^29 - 1); split pathological giant documents upstream")
    var cap = 16
    while (cap < nw * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    val out = new Array[Long](nw)
    var m = 0
    var s = 0
    while (s <= n - k) {
      val h = windowHash(s, s + k)
      var fresh = false
      if (h == 0L) {
        if (!hasZero) { hasZero = true; fresh = true }
      } else {
        var slot = (java.lang.Long.hashCode(h) & mask)
        while (table(slot) != 0L && table(slot) != h) slot = (slot + 1) & mask
        if (table(slot) == 0L) { table(slot) = h; fresh = true }
      }
      if (fresh) { out(m) = h; m += 1 }
      s += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** Column API: distinct k-shingle hashes of a token-array column. */
  def ofTokens(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))
}
