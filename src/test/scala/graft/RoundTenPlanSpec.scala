package graft

/** Physical-plan contracts for the round-9/10 catalog queries — the
  * shapes that keep them 100 TB-safe, pinned so a refactor that
  * silently de-optimizes fails loudly (same charter as
  * PlanContractSpec / NewOpsPlanSpec).
  */
class RoundTenPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_funnel: stage elections are aggregations + equi-joins, " +
    "never a window over the raw stream") {
    val p = plan("q_funnel")
    assert(!p.contains("Window"),
      s"funnel must not sort/window the raw stream; plan:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "stage joins must stay equi-joins")
    // every shuffle is keyed on user_id (user-bounded), never unkeyed
    assert(p.contains("hashpartitioning(user_id"),
      "stage elections shuffle on user_id")
  }

  test("q_retention: two user-bounded aggregations, no raw-stream window") {
    val p = plan("q_retention")
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_min"),
      "the cohort election must partial-aggregate map-side")
  }

  test("q_table_stats: every scan is pruned to exactly one column " +
    "(columnar bytes == one four-column scan, no Expand)") {
    val p = plan("q_table_stats")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 4, s"expected four pruned scans, got ${scans.size}")
    for (s <- scans) {
      // "FileScan parquet [l_orderkey#143L] ..." — one column in the
      // projection bracket
      val colsRead = s.dropWhile(_ != '[').takeWhile(_ != ']').count(_ == ',')
      assert(colsRead == 0, s"scan reads more than one column: ${s.take(160)}")
    }
    assert(!p.contains("Expand"),
      "the union shape must not pay the multi-distinct Expand")
  }

  test("q_table_stats_hll: pruned per-column scans; state is " +
    "register-bounded, no distinct-set aggregation") {
    val p = plan("q_table_stats_hll")
    // per-column projections column-prune to one column per scan, and
    // the single-consumption hllEstimate needs no join-back or cache
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 4, s"expected four pruned scans, got ${scans.size}")
    for (s <- scans) {
      val colsRead = s.dropWhile(_ != '[').takeWhile(_ != ']').count(_ == ',')
      assert(colsRead == 0, s"scan reads more than one column: ${s.take(160)}")
    }
    assert(!p.contains("Join"), "the estimate must not join back")
    assert(!p.contains("count(distinct"),
      "the HLL path must not expand an exact distinct aggregation")
    assert(p.contains("partial_max"),
      "register maxima must partial-aggregate map-side")
  }

  test("dedup_cluster_sizes: histogram rides the cluster table, " +
    "no cartesian") {
    val p = plan("dedup_cluster_sizes")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_count"),
      "both aggregations must partial-aggregate map-side")
  }

  test("sample_weighted: one distributed top-k, never a corpus sort") {
    val p = plan("sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      s"the E-S draw must be a bounded top-k; plan:\n${p.take(2000)}")
    assert(!p.contains("Exchange rangepartitioning"),
      "a range-exchange would mean a full corpus sort")
  }

  test("q2/q3 bucketed p95: aggregation state is one count per bucket " +
    "(HashAggregate strictly below the window), no exact percentile") {
    for (name <- Seq("q2_p95_verification", "q3_p95_resolution")) {
      val p = plan(name)
      assert(!p.contains("percentile"),
        s"$name must not buffer per-group values")
      val windowIdx = p.indexOf("Window")
      assert(windowIdx >= 0, s"$name: the crossing election is a window")
      assert(p.indexOf("HashAggregate", windowIdx) > windowIdx,
        s"$name: the window must consume the bucket HISTOGRAM, not raw " +
          s"rows; plan:\n${p.take(3000)}")
    }
  }
}
