package graft

import org.apache.spark.sql.functions._

/** Plan pins for the round-17 stored-index serving entries: the query
  * paths must run zero training jobs (no VecSum aggregate — centroids
  * come back as one bounded driver read) and reach the vectors scan
  * with a partition filter on the probed cells.
  */
class RoundSeventeenPlanSpec extends SparkSpec {

  private def assertServingPlan(plan: String, what: String): Unit = {
    assert(!plan.toLowerCase.contains("vecsum"),
      s"$what must not retrain in the query path:\n${plan.take(3000)}")
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters").exists(s =>
        s.startsWith(": [cell") && s.contains(" IN (")),
      s"$what must prune the vectors scan on cell:\n${plan.take(3000)}")
  }

  test("hybrid_retrieval_indexed: the dense leg serves from the " +
    "stored index — no training aggregate, partition-pruned scan") {
    val df = SparkEntry.queries("hybrid_retrieval_indexed")(
      spark, "/root/testdata/sf0.001")
    assertServingPlan(df.queryExecution.executedPlan.toString,
      "hybrid_retrieval_indexed")
    assert(df.count() > 0)
  }

  test("e2e_rag_serving: the filtered probe serves from the stored " +
    "chunk index — no training aggregate in the query path, " +
    "partition-pruned scan, and the eval emits one row per query") {
    val df = SparkEntry.queries("e2e_rag_serving")(
      spark, "/root/testdata/sf0.001")
    assertServingPlan(df.queryExecution.executedPlan.toString,
      "e2e_rag_serving")
    val rows = df.collect()
    assert(rows.length === 3, "three English query docs")
    // the +0.0005 query twin of each doc's chunk 0 is its nearest
    // allowed chunk: first_rank 1 and mrr 1.0 for every query
    assert(rows.forall(r => r.getLong(4) === 1L && r.getDouble(6) === 1.0),
      s"own chunk 0 must rank first per query: ${rows.mkString(", ")}")
  }
}
