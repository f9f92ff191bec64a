package graft

/** Single-query timing harness: `runMain graft.TimeOne <query> <sfDir>`
  * warms the query at sf0.001, then times 3 runs in an otherwise-idle
  * JVM with caches dropped between runs — the clean per-query number
  * that Bench's all-82-queries JVM can't give (codegen-class and GC
  * accumulation there inflate single-shot timings; Bench reports
  * median+min to compensate, this isolates one query outright).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sf = args(1)
    // warm-up dir and parallelism are overridable so the harness is
    // not tied to this sandbox's testdata layout or core count
    val warmDir = args.lift(2)
      .orElse(sys.env.get("SPARK_GRAFT_WARM_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus = cpus).appName("time-one").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    // warm
    fn(spark, warmDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    for (_ <- 1 to 3) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"TIMED ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
