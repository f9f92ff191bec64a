package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // see GraftSession: re-evaluates expensive generator inputs
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup (untimed): run EVERY query once at sf0.001 so session
    // init, codegen compilation, and JIT never land in a timed run —
    // measured warm-vs-cold deltas of 3-15 s per query were pure
    // one-time cost, not plan cost. Steady-state is the honest number
    // for the target deployment: a long-running cluster executes each
    // operator's generated code far more than once.
    for ((_, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
      try { fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
    // Several operators persist() staging tables and never unpersist
    // (session-scoped caches). Drop them all between runs: cache
    // lookup matches canonicalized PLANS, so a timed query over the
    // same sf dir would silently read the warmup's InMemoryRelations
    // and measure cached scans instead of execution. Clearing between
    // timed queries likewise keeps each number self-contained instead
    // of "incremental cost given whatever ran before it".
    def dropAllCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    dropAllCaches()
    // (name, seconds, error). A query that dies must NOT read as a fast
    // success: its error is recorded and surfaced in the JSON.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      dropAllCaches()
      val t0 = System.nanoTime()
      // noop sink: full materialization of every output column (a bare
      // count() would let Catalyst prune the projections under test).
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"n_failed":${results.count(_._3.nonEmpty)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
