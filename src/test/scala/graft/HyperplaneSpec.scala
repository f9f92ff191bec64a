package graft

import org.apache.spark.sql.functions._

import graft.functions.HyperplaneFunctions

/** The fused HyperplaneBitsExpr must be bit-identical to the
  * column-composed form it replaced (transform over sequence with a
  * zip_with/aggregate dot product per bit) on corpus embeddings AND
  * on every degenerate shape. In the composed form a null embedding,
  * an empty embedding, and a null ELEMENT all null every per-bit
  * aggregate (the outer transform array itself is never null), so the
  * fused expression emits an all-null bits array for those shapes.
  */
class HyperplaneSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-5 column composition, verbatim. */
  private def composed(emb: org.apache.spark.sql.Column, bits: Int) =
    transform(sequence(lit(0), lit(bits - 1)), i =>
      aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, j) =>
          x * ((pmod(xxhash64(i, j), lit(2001)) - lit(1000)).cast("double")
            / lit(1000.0))),
        lit(0.0), (acc, v) => acc + v) > 0)

  test("fused bits equal the composed form on corpus embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val both = e.select(col("vec_id"),
      HyperplaneFunctions.hyperplaneBits(col("emb"), 128).as("fused"),
      composed(col("emb"), 128).as("ref"))
    assert(both.filter(!(col("fused") <=> col("ref"))).isEmpty)
    assert(both.count() > 0)
  }

  test("null, empty, and null-element embeddings yield all-null bits") {
    val df = Seq(
      Some(Seq(Some(0.5), Some(-0.25), Some(1.0))),
      Some(Seq.empty[Option[Double]]),
      None, // null embedding
      Some(Seq(Some(0.5), None)) // null element nulls every bit
    ).toDF("emb")
    val got = df.select(
      HyperplaneFunctions.hyperplaneBits(col("emb"), 8).as("fused"),
      composed(col("emb"), 8).as("ref"))
    assert(got.filter(!(col("fused") <=> col("ref"))).isEmpty)
    val rows = got.select(col("fused")).as[Seq[Option[Boolean]]].collect()
    assert(rows(0).forall(_.isDefined))
    assert(rows(0).size === 8)
    Seq(1, 2, 3).foreach(i => assert(rows(i) === Seq.fill(8)(None)))
  }

  test("interpreted eval matches codegen") {
    // Force the interpreted path through a plan codegen can't cover:
    // eval() on the expression directly.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit128 = Literal(new GenericArrayData(Array(0.5, -0.25, 1.0)),
      ArrayType(DoubleType, containsNull = true))
    val evald = graft.functions.HyperplaneBitsExpr(lit128, 8).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toBooleanArray().toSeq
    val viaDf = Seq(Seq(0.5, -0.25, 1.0)).toDF("emb")
      .select(HyperplaneFunctions.hyperplaneBits(col("emb"), 8).as("b"))
      .as[Seq[Boolean]].head()
    assert(evald === viaDf)
  }
}
