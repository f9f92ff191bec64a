package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSimilarity

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b"))).as[Double].head()

  test("identical vectors → 1") { assert(math.abs(cos(Seq(1, 2, 3), Seq(1, 2, 3)) - 1.0) < 1e-12) }
  test("orthogonal vectors → 0") { assert(cos(Seq(1, 0), Seq(0, 1)) == 0.0) }
  test("opposite vectors → -1") { assert(math.abs(cos(Seq(1, 1), Seq(-1, -1)) + 1.0) < 1e-12) }
  test("zero vector → 0 (guarded denominator)") { assert(cos(Seq(0, 0), Seq(1, 2)) == 0.0) }

  test("null input → null (BinaryExpression null handling)") {
    val out = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b"))).collect()(0)
    assert(out.isNullAt(0))
  }

  test("pack+byte dot product equals the composed zip_with arithmetic") {
    import graft.functions.VectorFunctions.{byteDotProduct, packSignedBytes}
    // deterministic pseudo-random codes across the full [-127,127]
    // range, incl. negatives and zeros
    val rows = (0 until 50).map { i =>
      val a = (0 until 64).map(j => ((i * 31 + j * 17) % 255 - 127).toLong)
      val b = (0 until 64).map(j => ((i * 13 + j * 29) % 255 - 127).toLong)
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val viaBytes = df.select(
      byteDotProduct(packSignedBytes(col("a")), packSignedBytes(col("b"))).as("d"))
      .as[Long].collect()
    val viaBuiltins = df.select(
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("d"))
      .as[Long].collect()
    assert(viaBytes.toSeq === viaBuiltins.toSeq)
  }

  test("pack_signed_bytes rejects out-of-range values") {
    val ex = intercept[Exception] {
      Seq(Seq(1L, 300L)).toDF("a")
        .select(graft.functions.VectorFunctions.packSignedBytes(col("a")))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .limit(20).cache()
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(cosineSimilarity(col("a.emb"), col("b.emb")).as("c"))
    val viaExpr = pairs.agg(sum(col("c"))).as[Double].head()
    // reference computation via built-in higher-order functions
    val viaBuiltins = e.as("a").crossJoin(e.as("b")).select(
      (aggregate(zip_with(col("a.emb"), col("b.emb"), _ * _), lit(0.0), _ + _) /
        (sqrt(aggregate(col("a.emb"), lit(0.0), (s, x) => s + x * x)) *
          sqrt(aggregate(col("b.emb"), lit(0.0), (s, x) => s + x * x)))).as("c"))
      .agg(sum(col("c"))).as[Double].head()
    assert(math.abs(viaExpr - viaBuiltins) < 1e-9)
  }
}
