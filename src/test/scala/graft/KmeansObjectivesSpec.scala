package graft

import org.apache.spark.sql.functions._

import graft.functions.KmeansObjectives

/** The fused kmeans-objective expression must be bit-identical to the
  * composed zip_with/aggregate form it replaced — the sim_ivf_kmeans
  * and sim_pq_topk oracles replay that exact arithmetic in SQL.
  */
class KmeansObjectivesSpec extends SparkSpec {
  import spark.implicits._

  test("fused objectives are bit-identical to the composed HOF form") {
    val rng = new scala.util.Random(5L)
    val cents: Seq[(Array[Long], Long)] = Seq.fill(7) {
      (Array.fill(16)(rng.nextInt(20000).toLong - 10000),
        rng.nextInt(40).toLong + 1)
    }
    val rows = Seq.fill(40)(Seq.fill(16)(rng.nextInt(2001).toLong - 1000))
    val df = rows.toDF("q")
    val composed = array(cents.map { case (s, n) =>
      aggregate(
        zip_with(col("q"), typedLit(s.toSeq), (x, sv) =>
          (lit(n) * x - sv) * (lit(n) * x - sv)),
        lit(0L), (acc, v) => acc + v)
        .cast("double") / lit(n.toDouble * n.toDouble)
    }: _*)
    val got = df.select(
      KmeansObjectives.of(col("q"), cents).as("a"),
      composed.as("b"))
      .as[(Seq[Double], Seq[Double])].collect()
    for ((a, b) <- got) {
      assert(a.length === b.length)
      // exact double equality, not tolerance — the oracle needs it
      for ((x, y) <- a.zip(b))
        assert(java.lang.Double.doubleToRawLongBits(x) ===
          java.lang.Double.doubleToRawLongBits(y))
    }
  }

  test("null input yields null") {
    val out = Seq(Option.empty[Seq[Long]]).toDF("q")
      .select(KmeansObjectives.of(col("q"),
        Seq((Array(1L, 2L), 1L)))).collect()(0)
    assert(out.isNullAt(0))
  }
}
