package graft

import graft.datapipe.Preference

import org.apache.spark.sql.functions._

/** Preference-data analytics: the Wilson tally against hand-computed
  * values and the Bradley–Terry MM fit against an independent plain-
  * arithmetic reference plus its model invariants.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def wilsonRef(wins: Long, n: Long): Double = {
    val nd = n.toDouble
    val p = wins.toDouble / nd
    val raw = (p + 3.8416 / (2.0 * nd)
      - 1.96 * math.sqrt((p * (1.0 - p) + 3.8416 / (4.0 * nd)) / nd)) /
      (1.0 + 3.8416 / nd)
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("winRates: tally and Wilson bound match hand-computed values, " +
    "and a 1/1 item ranks below a 9/10 item") {
    // a: 9 wins 1 loss; b: 1 win 0 losses; c: 1 win 10 losses
    val df = (Seq.fill(9)(("a", "c")) :+ ("c", "a") :+ ("b", "c"))
      .toDF("w", "l")
    val out = Preference.winRates(df, "w", "l").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) === 9L) // wins
    assert(out("a").getLong(2) === 1L) // losses
    assert(out("a").getLong(3) === 10L)
    assert(out("a").getAs[Double]("win_rate") === 0.9)
    assert(out("a").getAs[Double]("wilson_lb") === wilsonRef(9, 10))
    assert(out("b").getLong(3) === 1L)
    assert(out("b").getAs[Double]("wilson_lb") === wilsonRef(1, 1))
    // the whole point of Wilson: 9/10 beats 1/1
    assert(out("a").getAs[Double]("wilson_lb") >
      out("b").getAs[Double]("wilson_lb"))
    assert(out("c").getLong(1) === 1L)
    assert(out("c").getLong(2) === 10L)
  }

  test("btStrengths: strengths from a transitive matrix order as " +
    "expected, sum to ~1, and match an independent unrounded MM fit " +
    "to 1e-6") {
    // a beats b 8-2, b beats c 7-3, a beats c 9-1: strength a > b > c
    val pairs = (Seq.fill(8)(("a", "b")) ++ Seq.fill(2)(("b", "a")) ++
      Seq.fill(7)(("b", "c")) ++ Seq.fill(3)(("c", "b")) ++
      Seq.fill(9)(("a", "c")) ++ Seq.fill(1)(("c", "a"))).toDF("w", "l")
    val out = Preference.btStrengths(pairs, "w", "l", iters = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Double]("pi"), r.getLong(5))).toMap
    assert(out("a")._1 === 17L && out("a")._2 === 3L && out("a")._3 === 20L)
    assert(out("b")._1 === 9L && out("b")._2 === 11L)
    assert(out("c")._1 === 4L && out("c")._2 === 16L)
    assert(out("a")._5 === 1L && out("b")._5 === 2L && out("c")._5 === 3L)
    val piSum = out.values.map(_._4).sum
    assert(math.abs(piSum - 1.0) < 1e-6, s"strengths must normalize: $piSum")

    // independent reference: plain-double MM, no per-step rounding —
    // the 8-dp convention must stay within 1e-6 of it
    val g = Map(("a", "b") -> 10.0, ("b", "a") -> 10.0,
      ("b", "c") -> 10.0, ("c", "b") -> 10.0,
      ("a", "c") -> 10.0, ("c", "a") -> 10.0)
    val wins = Map("a" -> 17.0, "b" -> 9.0, "c" -> 4.0)
    val names = Seq("a", "b", "c")
    var pi = names.map(_ -> 1.0 / 3).toMap
    for (_ <- 0 until 8) {
      val u = names.map { i =>
        val d = names.filter(j => j != i && g.contains((i, j)))
          .map(j => g((i, j)) / (pi(i) + pi(j))).sum
        i -> wins(i) / d
      }.toMap
      val s = u.values.sum
      pi = u.map { case (k, v) => k -> v / s }
    }
    for (nm <- names)
      assert(math.abs(out(nm)._4 - pi(nm)) < 1e-6,
        s"$nm: ${out(nm)._4} vs reference ${pi(nm)}")
  }

  test("btStrengths: a group seen only in same-group pairs is absent " +
    "and < 2 cross-group groups refuses loudly") {
    val pairs = (Seq(("a", "b"), ("b", "a"), ("c", "c"))).toDF("w", "l")
    val out = Preference.btStrengths(pairs, "w", "l").collect()
    assert(out.map(_.getString(0)).sorted === Array("a", "b"))
    val sameOnly = Seq(("c", "c"), ("c", "c")).toDF("w", "l")
    val e = intercept[IllegalArgumentException] {
      Preference.btStrengths(sameOnly, "w", "l")
    }
    assert(e.getMessage.contains(">= 2 groups"))
  }

  test("groupAdvantage: hand-computed standardization, zero-variance " +
    "NULL, and per-group mean ~0 / population std ~1 on the fixture") {
    // group g: rewards 2, 4, 6 -> mean 4, pop std sqrt(8/3)
    val df = Seq(("a", "g", 2L), ("b", "g", 4L), ("c", "g", 6L),
      ("d", "h", 5L), ("e", "h", 5L)).toDF("id", "grp", "r")
    val out = Preference.groupAdvantage(df, "id", col("r"), Seq("grp"))
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[java.lang.Double]("advantage")).map(_.doubleValue))
      .toMap
    val sd = math.sqrt(8.0 / 3.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // exact-integer rewrite: (n*r - s1)/sqrt(n*s2 - s1^2)
    assert(out("a").get === r6((3.0 * 2 - 12) / math.sqrt(3.0 * 56 - 144)))
    assert(math.abs(out("a").get - (2 - 4) / sd) < 1e-6)
    assert(math.abs(out("c").get - (6 - 4) / sd) < 1e-6)
    assert(out("d").isEmpty && out("e").isEmpty,
      "zero-variance groups carry no signal")

    val fx = SparkEntry.queries("rl_advantage")(spark, sf)
    val stats = fx.filter(col("advantage").isNotNull)
      .groupBy(col("source"))
      .agg(avg(col("advantage")).as("m"),
        avg(col("advantage") * col("advantage")).as("m2"),
        count(lit(1)).as("n"))
      .collect()
    assert(stats.nonEmpty)
    for (r <- stats) {
      assert(math.abs(r.getAs[Double]("m")) < 1e-4,
        s"${r.getString(0)}: standardized mean must be ~0")
      assert(math.abs(r.getAs[Double]("m2") - 1.0) < 1e-3,
        s"${r.getString(0)}: standardized second moment must be ~1")
    }
  }

  test("winRates + btStrengths run green over the fixture pairs") {
    val out = SparkEntry.queries("pref_winrate")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Double]("wilson_lb") >= 0.0 &&
      r.getAs[Double]("wilson_lb") <= 1.0))
    val bt = SparkEntry.queries("pref_bt_sources")(spark, sf).collect()
    assert(bt.nonEmpty)
    val ranks = bt.map(_.getAs[Long]("bt_rank")).sorted
    assert(ranks === (1L to bt.length).toArray, "ranks must be 1..k")
  }
}
