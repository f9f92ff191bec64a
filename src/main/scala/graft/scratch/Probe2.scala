package graft.scratch

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.datapipe.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev-only probe: shingle-pass variants. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = {
      val base = Tables.documents(spark, d).select(col("doc_id").as("id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism)
      val toks = split(TextAnalysis.normalize(col("text")), " ")
      val truncated = array_join(slice(toks, lit(1), size(toks) - 1), " ")
      base.unionByName(base.select((col("id") + 1000000).as("id"), truncated.as("text")))
    }

    time("warmup (count docs)") { docs.write.format("noop").mode("overwrite").save() }

    val staged = docs
      .select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))

    time("explode only") {
      docs.select(col("id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        .write.format("noop").mode("overwrite").save()
    }
    time("staged sh+size+explode") {
      staged.write.format("noop").mode("overwrite").save()
    }
    time("staged again") {
      staged.write.format("noop").mode("overwrite").save()
    }

    val sh = staged
    time("join smj (string key)") {
      sh.select(col("shingle"), col("id").as("a_id"), col("n_sh").as("a_n"))
        .join(sh.select(col("shingle"), col("id").as("b_id"), col("n_sh").as("b_n")), Seq("shingle"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_common"), max(col("a_n")).as("a_n"), max(col("b_n")).as("b_n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("join shuffle_hash string") {
      sh.select(col("shingle"), col("id").as("a_id"), col("n_sh").as("a_n")).hint("shuffle_hash")
        .join(sh.select(col("shingle"), col("id").as("b_id"), col("n_sh").as("b_n")), Seq("shingle"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_common"), max(col("a_n")).as("a_n"), max(col("b_n")).as("b_n"))
        .write.format("noop").mode("overwrite").save()
    }
    val shh = staged.select(xxhash64(col("shingle")).as("hsh"), col("id"), col("n_sh"))
    time("join shuffle_hash hash64") {
      shh.select(col("hsh"), col("id").as("a_id"), col("n_sh").as("a_n")).hint("shuffle_hash")
        .join(shh.select(col("hsh"), col("id").as("b_id"), col("n_sh").as("b_n")), Seq("hsh"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_common"), max(col("a_n")).as("a_n"), max(col("b_n")).as("b_n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("join hash64 more partitions") {
      spark.conf.set("spark.sql.shuffle.partitions", "96")
      shh.select(col("hsh"), col("id").as("a_id"), col("n_sh").as("a_n")).hint("shuffle_hash")
        .join(shh.select(col("hsh"), col("id").as("b_id"), col("n_sh").as("b_n")), Seq("hsh"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_common"), max(col("a_n")).as("a_n"), max(col("b_n")).as("b_n"))
        .write.format("noop").mode("overwrite").save()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }

    time("postings pair-gen") {
      val postings = sh.groupBy(col("shingle"))
        .agg(collect_list(struct(col("id"), col("n_sh"))).as("p"))
        .filter(size(col("p")).between(2, 100))
        .select(array_sort(col("p")).as("p"))
      val pairs = postings.select(explode(
        flatten(transform(col("p"), (a, i) =>
          transform(slice(col("p"), i + 2, size(col("p"))), b =>
            struct(a.getField("id").as("a_id"), a.getField("n_sh").as("a_n"),
              b.getField("id").as("b_id"), b.getField("n_sh").as("b_n")))))).as("pr"))
      pairs.groupBy(col("pr.a_id"), col("pr.b_id"))
        .agg(count(lit(1)).as("n_common"), max(col("pr.a_n")).as("a_n"), max(col("pr.b_n")).as("b_n"))
        .write.format("noop").mode("overwrite").save()
    }
    staged.explain("formatted")
    spark.stop()
  }
}
