package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{Dedup, TextAnalysis}

/** SimHash candidate-pair operator: the banded join must be EXACTLY
  * the brute-force all-pairs hamming scan (pigeonhole: hamming <
  * bands ⇒ at least one band slice untouched ⇒ candidate generated),
  * and the planted twins must be recalled. This assertion backs the
  * driver's rows-only check for `dedup_simhash`.
  */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def twinsCorpus = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val toks = split(TextAnalysis.normalize(col("text")), " ")
    val truncated = array_join(slice(toks, lit(1), size(toks) - 1), " ")
    docs.unionByName(
      docs.select((col("id") + 1000000).as("id"), truncated.as("text")))
  }

  test("banded pairs == brute-force hamming pairs (pigeonhole-complete)") {
    val banded = Dedup.simhashPairs(twinsCorpus, "id", "text",
        k = 3, bands = 8, maxHamming = 7)
      .as[(Long, Long, Int)].collect().toSet
    val codes = twinsCorpus
      .select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("id"), Dedup.shingleHashes(col("sh")).as("hh"))
      .select(col("id"), Dedup.simhashFromHashes(col("hh")).as("code"))
    val brute = codes.select(col("id").as("a_id"), col("code").as("a_code"))
      .crossJoin(codes.select(col("id").as("b_id"), col("code").as("b_code")))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_code").bitwiseXOR(col("b_code"))).as("hamming"))
      .filter(col("hamming") <= 7)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}: band join must be exact-complete")
    assert(banded.nonEmpty, "twins corpus must yield near-dup pairs")
    // recall sanity: a healthy share of planted twins sits within
    // hamming 7 of its original (distribution probed at build time)
    val twinPairs = banded.count { case (a, b, _) => b == a + 1000000 }
    assert(twinPairs > 10, s"expected planted twins among pairs, got $twinPairs")
  }

  test("simhash64 expression matches interpreted eval") {
    // exercises both the codegen and non-codegen paths over edge shapes
    val df = Seq(
      Seq(0L), Seq(-1L), Seq(Long.MinValue, Long.MaxValue),
      (1L to 67L).toSeq).toDF("hh")
    val viaExpr = df.select(Dedup.simhashFromHashes(col("hh"))).as[Long].collect()
    def ref(hs: Seq[Long]): Long = {
      val votes = Array.fill(64)(0)
      hs.foreach { h =>
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1 }
      }
      (0 until 64).foldLeft(0L)((c, b) => if (votes(b) > 0) c | (1L << b) else c)
    }
    val expected = Seq(Seq(0L), Seq(-1L), Seq(Long.MinValue, Long.MaxValue),
      (1L to 67L).toSeq).map(ref)
    assert(viaExpr.toSeq == expected)
  }
}
