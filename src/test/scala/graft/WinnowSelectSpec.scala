package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowSelect

/** The O(n) monotonic-deque winnow selection vs the naive O(n·w)
  * reference, plus the contract edges (short, empty, nulls, ties,
  * zero hashes) and the codegen path through a real DataFrame.
  */
class WinnowSelectSpec extends AnyFunSuite {

  private def naive(h: Seq[Long], w: Int): Seq[Long] =
    if (h.isEmpty) Seq.empty
    else if (h.length < w) Seq(h.min)
    else h.sliding(w).map(_.min).toSeq.distinct

  private def viaExpr(h: Seq[Long], w: Int): Seq[Long] = {
    val arr = WinnowSelect.compute(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(h.toArray), w)
    arr.toLongArray().toSeq
  }

  test("matches the naive reference on random arrays") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40)
      val w = rnd.nextInt(6) + 1
      // small value range forces ties and repeated minima
      val h = Seq.fill(n)(rnd.nextInt(8).toLong)
      assert(viaExpr(h, w).sorted === naive(h, w).sorted,
        s"n=$n w=$w h=$h")
    }
  }

  test("contract edges: empty, shorter-than-window, zero hash") {
    assert(viaExpr(Seq.empty, 4) === Seq.empty)
    assert(viaExpr(Seq(7L, 3L), 4) === Seq(3L), "global min below window")
    assert(viaExpr(Seq(0L, 5L, 0L, 6L), 2) === Seq(0L),
      "0 is a valid hash and dedups like any other value")
  }

  test("codegen path: the expression runs inside a DataFrame select") {
    val spark = SparkSpec.session
    import spark.implicits._
    val out = Seq((1L, Seq(9L, 2L, 5L, 7L, 1L, 8L)))
      .toDF("id", "hs")
      .select(col("id"), WinnowSelect.of(col("hs"), 4).as("sel"))
      .as[(Long, Seq[Long])].collect().head
    assert(out === ((1L, Seq(2L, 1L))),
      "windows [9257]=2 [2571]=1 [5718]=1 → distinct (2,1)")
  }

  test("null elements never win a window") {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](5L, null, 3L, null))
    assert(WinnowSelect.compute(arr, 2).toLongArray().toSeq === Seq(5L, 3L))
  }

  test("all-null windows emit no fingerprint (no MaxValue sentinel)") {
    val allNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](null, null, null))
    assert(WinnowSelect.compute(allNull, 2).numElements() === 0,
      "every window all-null → empty selection")
    assert(WinnowSelect.compute(allNull, 5).numElements() === 0,
      "shorter-than-window all-null → empty selection")
    val mixed = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](null, null, 4L, null, null))
    assert(WinnowSelect.compute(mixed, 2).toLongArray().toSeq === Seq(4L),
      "only windows containing the real value select it; all-null windows skip")
  }
}
