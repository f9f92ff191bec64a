package graft.scratch
import graft.{GraftSession, SparkEntry}
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val df = SparkEntry.entry(spark)
    println("entry rows=" + df.count())
    df.show(3)
    spark.stop()
  }
}
