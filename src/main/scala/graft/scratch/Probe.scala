package graft.scratch

import graft.GraftSession
import graft.queries.Catalog

/** Dev-only probe for timing experiments (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_embedding_cosine", "sim_bruteforce_topk", "sim_ivf_topk")
    names.foreach { name =>
      val t0 = System.nanoTime()
      Catalog.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
