package graft

import java.math.{BigDecimal => JBD}

import graft.datapipe.UnigramLM

/** Unigram-LM tokenizer: exact-decimal Viterbi kernel, seed-model
  * parity with a driver replay, tie-break determinism, and the hard-
  * EM coordinate-ascent monotonicity that certifies the training
  * loop (see UnigramLM Scaladoc for the honest-scope note).
  */
class UnigramLMSpec extends SparkSpec {
  import spark.implicits._

  private def d8(x: Double): JBD =
    new JBD(x).setScale(8, java.math.RoundingMode.HALF_UP)

  test("viterbi kernel: bigram beats the two-char path when likelier") {
    // lp(ab) > lp(a)+lp(b) → one piece
    val lp = Map("a" -> d8(-2.0), "b" -> d8(-2.0), "ab" -> d8(-1.0))
    val (n, score, segs) = UnigramLM.viterbi("ab", lp.get(_).orNull, 2)
    assert(n === 1L && segs === List("ab"))
    assert(score === d8(-1.0))
  }

  test("viterbi kernel: exact tie prefers the longest piece") {
    // lp(ab) == lp(a)+lp(b) exactly in decimal — the oracle's
    // >=-prefers-bigram rule must be the kernel's rule too
    val lp = Map("a" -> d8(-1.0), "b" -> d8(-1.0), "ab" -> d8(-2.0))
    val (n, _, segs) = UnigramLM.viterbi("ab", lp.get(_).orNull, 2)
    assert(n === 1L && segs === List("ab"))
  }

  test("viterbi kernel: uncovered position takes the UnkLp step") {
    val lp = Map("a" -> d8(-1.0))
    val (n, score, segs) = UnigramLM.viterbi("ax", lp.get(_).orNull, 2)
    assert(n === 2L && segs === List("a", "x"))
    assert(score === d8(-1.0).add(UnigramLM.UnkLp))
  }

  test("seed model + encode match a full driver replay") {
    // corpus 'ab ab b': pieces a:2, ab:2, b:3, total 7
    // viterbi(ab): max(lp(ab), lp(a)+lp(b)) → single piece
    val docs = Seq((1L, "ab ab b"), (2L, "")).toDF("doc_id", "text")
    val model = UnigramLM.seedModel(docs, "text", maxPieceLen = 2)
    assert(model.lp("a") === d8(math.log(2.0 / 7)))
    assert(model.lp("ab") === d8(math.log(2.0 / 7)))
    assert(model.lp("b") === d8(math.log(3.0 / 7)))
    val out = UnigramLM.encodeCounts(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // total_lp = 2·lp(ab) + lp(b), decimal-exact then 6-dp
    val exp = model.lp("ab").add(model.lp("ab")).add(model.lp("b"))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(out(1L) === ((3L, 3L, exp)))
    assert(out(2L) === ((0L, 0L, 0.0)), "empty doc zero-fills")
  }

  test("hard EM never decreases the coordinate-ascent objective") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat and the hat"),
      (3L, "a cat sat"),
      (4L, "mat the sat cat")).toDF("doc_id", "text")
    var model = UnigramLM.seedModel(docs, "text", maxPieceLen = 3)
    var ll = UnigramLM.corpusLogLik(docs, "text", model)
    for (_ <- 1 to 3) {
      model = UnigramLM.emRound(docs, "text", model)
      val next = UnigramLM.corpusLogLik(docs, "text", model)
      // exact-decimal objective; 1e-6 slack absorbs the 8-dp
      // re-rounding of the M-step's renormalized log-probs
      assert(next.subtract(ll).doubleValue >= -1e-6,
        s"EM round decreased the objective: $ll -> $next")
      ll = next
    }
  }

  test("EM prunes pieces the argmax segmentations stop using") {
    // 'ab' dominates: after one round the model keeps only pieces
    // some Viterbi segmentation actually used
    val docs = Seq((1L, "ab ab ab b")).toDF("doc_id", "text")
    val seed = UnigramLM.seedModel(docs, "text", maxPieceLen = 2)
    assert(seed.lp.contains("a"), "seed covers every substring")
    val m1 = UnigramLM.emRound(docs, "text", seed)
    assert(m1.lp.contains("ab") && m1.lp.contains("b"))
    assert(!m1.lp.contains("a"),
      "'a' appears in no argmax segmentation and must drop out")
  }
}
