package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{SftPrep, Staging}

/** Contracts of the SFT-prep operators
  * ([[graft.datapipe.SftPrep]]): the chat-template byte contract and
  * the closed-form loss-mask arithmetic of `renderConversations`,
  * and the deterministic mirror pairing of `preferencePairs`. The
  * value-level certification at corpus scale is the DuckDB oracle
  * (`sft_render`, `preference_pairs`); these pin the rules the
  * oracle's fixed shape cannot reach.
  */
class SftPrepSpec extends SparkSpec {
  import spark.implicits._

  test("renderConversations: template bytes, turn cutting, and the " +
    "closed-form mask split match a hand-built example") {
    // 5 tokens, width 2 -> turns: [a b | c d | e], roles u/a/u
    val docs = Seq((7L, "a b  C d e")).toDF("doc_id", "text")
    val out = SftPrep.renderConversations(docs, "doc_id", "text",
      turnTokens = 2).collect()(0)
    val expected =
      "<|user|> a b <|eot|>\n<|assistant|> c d <|eot|>\n<|user|> e <|eot|>"
    assert(out.getAs[Long]("n_tokens") === 5L)
    assert(out.getAs[Long]("n_turns") === 3L)
    assert(out.getAs[Long]("user_tokens") === 3L)
    assert(out.getAs[Long]("asst_tokens") === 2L)
    assert(out.getAs[Double]("loss_ratio") === 0.4)
    assert(out.getAs[Long]("render_len") === expected.length.toLong)
    assert(out.getAs[String]("render_md5") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest(expected.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("renderConversations: closed-form user/asst split equals the " +
    "per-turn walk for every length 1..40 at widths 1, 3, 8") {
    for (w <- Seq(1, 3, 8); n <- 1 to 40) {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val out = SftPrep.renderConversations(
        Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text", w)
        .collect()(0)
      val turns = (1 to n).map(i => s"t$i").grouped(w).toSeq
      val user = turns.zipWithIndex
        .collect { case (t, i) if i % 2 == 0 => t.size }.sum.toLong
      assert(out.getAs[Long]("n_turns") === turns.size.toLong,
        s"n=$n w=$w")
      assert(out.getAs[Long]("user_tokens") === user, s"n=$n w=$w")
      assert(out.getAs[Long]("asst_tokens") === (n - user).toLong,
        s"n=$n w=$w")
    }
  }

  test("renderConversations: an empty document is one empty user turn " +
    "(the split-camp one-empty-token convention)") {
    val out = SftPrep.renderConversations(
      Seq((0L, "")).toDF("doc_id", "text"), "doc_id", "text", 8)
      .collect()(0)
    assert(out.getAs[Long]("n_tokens") === 1L)
    assert(out.getAs[Long]("n_turns") === 1L)
    assert(out.getAs[Long]("user_tokens") === 1L)
    assert(out.getAs[Long]("asst_tokens") === 0L)
    assert(out.getAs[Double]("loss_ratio") === 0.0)
  }

  test("spanCorrupt: renders match a hand-built T5 pair and the " +
    "closed-form accounting equals the masking rule") {
    // 7 tokens, spanLen 2, everyN 5: positions 1,2 and 6,7 masked
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = SftPrep.spanCorrupt(docs, "doc_id", "text",
      spanLen = 2, everyN = 5).collect()(0)
    val inputs = "<extra_id_0> c d e <extra_id_1>"
    val targets = "<extra_id_0> a b <extra_id_1> f g"
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getAs[Long]("n_tokens") === 7L)
    assert(out.getAs[Long]("masked_tokens") === 4L)
    assert(out.getAs[Long]("n_spans") === 2L)
    assert(out.getAs[Long]("inputs_len") === inputs.length.toLong)
    assert(out.getAs[Long]("targets_len") === targets.length.toLong)
    assert(out.getAs[String]("inputs_md5") === md5(inputs))
    assert(out.getAs[String]("targets_md5") === md5(targets))
  }

  test("spanCorrupt: closed-form masked/span counts equal a per-" +
    "position evaluation of the masking rule for lengths 1..50") {
    for (n <- 1 to 50) {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val out = SftPrep.spanCorrupt(
        Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text",
        spanLen = 3, everyN = 20).collect()(0)
      val maskedPos = (1 to n).filter(p => (p - 1) % 20 < 3)
      val spans = maskedPos.map(p => (p - 1) / 20).distinct.size
      assert(out.getAs[Long]("masked_tokens") === maskedPos.size.toLong,
        s"n=$n")
      assert(out.getAs[Long]("n_spans") === spans.toLong, s"n=$n")
    }
  }

  test("preferencePairs: mirror pairing, tie drop, and odd-middle " +
    "exclusion on a hand-built stratum") {
    // one group, scores: d1=9 d2=7 d3=7 d4=5 d5=1
    // ranked: d1,d2,d3,d4,d5 -> pairs (d1,d5) margin 8, (d2,d4) margin 2;
    // middle d3 unpaired
    val docs = Seq(
      (1L, "g", 9L), (2L, "g", 7L), (3L, "g", 7L), (4L, "g", 5L),
      (5L, "g", 1L),
      // a second group where the only pair is a tie -> dropped
      (6L, "h", 4L), (7L, "h", 4L)
    ).toDF("doc_id", "grp", "score")
    val out = SftPrep.preferencePairs(docs, "doc_id", col("score"),
      Seq("grp"))
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("pair_rank"),
        r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
        r.getAs[Long]("margin"))).toSet
    Staging.releaseAll()
    assert(out === Set(("g", 1L, 1L, 5L, 8L), ("g", 2L, 2L, 4L, 2L)))
  }

  test("preferencePairs: equal scores tie-break by id — the pairing " +
    "is a pure function of the input") {
    val docs = Seq((10L, "g", 5L), (11L, "g", 5L), (12L, "g", 2L),
      (13L, "g", 1L)).toDF("doc_id", "grp", "score")
    val out = SftPrep.preferencePairs(docs, "doc_id", col("score"),
      Seq("grp")).collect()
      .map(r => (r.getAs[Long]("pair_rank"), r.getAs[Long]("chosen_id"),
        r.getAs[Long]("rejected_id"))).toSet
    Staging.releaseAll()
    // rank order: 10 (score 5, lower id), 11, 12, 13
    assert(out === Set((1L, 10L, 13L), (2L, 11L, 12L)))
  }
}
