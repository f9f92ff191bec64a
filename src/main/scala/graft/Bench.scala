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
      graft.datapipe.Staging.releaseAll() // also drains the registry
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    dropAllCaches()
    // (name, runs-in-seconds, error). A query that dies must NOT read
    // as a fast success: its error is recorded and surfaced in the JSON.
    //
    // Each query is timed REPS times and reported as min + median:
    // single-shot timings in a long-lived JVM that has compiled 74
    // queries' codegen classes drift by up to 10x from GC pressure and
    // JIT deopt (BENCH_r04 reported phantom 10x regressions on code
    // that had not changed). Median-of-3 is robust to one bad run;
    // emitting min alongside median makes residual noise visible in
    // the artifact instead of silently polluting cross-round diffs.
    val REPS = 3
    // Calibration for the measured hot-JVM drift (r7 judge audit: the
    // same code reads ~1.5-1.7x slower late in a 100-query run from
    // codegen-class and GC accumulation, polluting cross-round
    // artifact diffs): time ONE fixed reference query now (clean
    // post-warmup state) and again after the main loop, and record
    // end/start as this run's inflation factor — consumers can
    // normalize late-alphabet queries without a fresh-JVM re-measure.
    // TWO calibration probes: the light q1 tracks session/launch
    // overhead, but r11 observed heavy compositions inflating ~2x
    // in-bench while q1 read 1.002 — accumulated JIT/metaspace/GC
    // state taxes long multi-stage queries disproportionately. The
    // heavy probe must therefore BE a staged multi-model chain (a
    // zero-shuffle per-row fold like text_entropy has the same JVM
    // profile as q1 and reads ~1.0 regardless): e2e_stream_gate
    // trains NB + bigram-LM + DSIR models and scores through all
    // three — the shape that actually inflated.
    val CalQuery = "q1_pricing_summary"
    val CalHeavy = "e2e_stream_gate"
    def timeCalQ(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val runs = Vector.tabulate(REPS) { _ =>
        dropAllCaches()
        System.gc()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(runs.size / 2)
    }
    def timeCal(): Double = timeCalQ(CalQuery)
    val calStart = timeCal()
    val calHeavyStart = timeCalQ(CalHeavy)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = Vector.newBuilder[Double]
      var err: Option[String] = None
      var r = 0
      while (r < REPS && err.isEmpty) {
        dropAllCaches()
        // Collect garbage from the previous query's runs so its heap
        // debt is not billed to this timing window.
        System.gc()
        val t0 = System.nanoTime()
        // noop sink: full materialization of every output column (a bare
        // count() would let Catalyst prune the projections under test).
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
        runs += (System.nanoTime() - t0) / 1e9
        r += 1
      }
      (name, runs.result(), err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Driver contract: "queries" stays name -> one number (the median).
    // "stats" carries min/median/all runs for noise auditing.
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:${median(v)}" }
      .mkString("{", ",", "}")
    val stats = results.map { case (k, v, _) =>
      s"""${jstr(k)}:{"min":${v.min},"median":${median(v)},"runs":[${v.mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(r => median(r._2)).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stats":$stats,"failed":$failed,"n_failed":${results.count(_._3.nonEmpty)},"sf":"$sfDir","reps":$REPS}""")
    // The full line above grows with the catalog (97+ queries × stats)
    // and the driver archives only the output TAIL — r6's artifact
    // kept ~18 alphabetically-last queries and lost the total. This
    // second compact line (total + failures + the 10 slowest medians)
    // is small enough to always survive the tail window, so every
    // round's headline is comparable even if the full line truncates.
    // Named "total_compact", NOT "total": a consumer keying records by
    // metric must never see two conflicting "total" objects with
    // different shapes (prefer this one when both survive).
    val slowest = results.sortBy(r => -median(r._2)).take(10)
      .map { case (k, v, _) => s"${jstr(k)}:${median(v)}" }
      .mkString("{", ",", "}")
    val calEnd = timeCal()
    val calHeavyEnd = timeCalQ(CalHeavy)
    val inflation = if (calStart > 0) calEnd / calStart else 1.0
    val inflationHeavy =
      if (calHeavyStart > 0) calHeavyEnd / calHeavyStart else 1.0
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${results.count(_._3.nonEmpty)},"slowest":$slowest,"calibration":{"query":${jstr(CalQuery)},"start_sec":$calStart,"end_sec":$calEnd,"hot_jvm_inflation":$inflation,"heavy_query":${jstr(CalHeavy)},"heavy_start_sec":$calHeavyStart,"heavy_end_sec":$calHeavyEnd,"heavy_hot_jvm_inflation":$inflationHeavy},"sf":"$sfDir","reps":$REPS}""")
    spark.stop()
  }
}
