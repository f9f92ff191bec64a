package graft

import org.apache.spark.sql.SparkSession

/** Local timing helper: warm + time a comma-separated subset of
  * catalog queries against one sf dir (the per-query slice of what
  * [[Bench]] does for the whole board — for iterating on a new
  * operator without a full bench run).
  *
  * Usage: runMain graft.TimeQueries <sfDir> <name,name,...>
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      graft.datapipe.Staging.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"   WARM-FAIL $n: ${e.getMessage}") }
      drop()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $n")
      } catch { case e: Throwable => println(s"   FAIL $n: ${e.getMessage}") }
      drop()
    }
    spark.stop()
  }
}
