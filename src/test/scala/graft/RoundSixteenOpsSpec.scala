package graft

import org.apache.spark.sql.functions._

/** Round-16 operators: iterated DoReMi's convergence shape, the
  * semantic-decontamination degenerate contracts, and the WAV
  * parser's malformed-input guards (the materialized vector index
  * has its own VectorIndexSpec).
  */
class RoundSixteenOpsSpec extends SparkSpec {

  import spark.implicits._

  test("doremiWeightsIter: weights renormalize every round, the " +
    "under-served source gains weight, and the trajectory converges " +
    "(shrinking L1 steps)") {
    import graft.datapipe.Sampling
    // two sources with overlapping vocabulary (fully disjoint
    // supports degenerate to kl = -ln(w) for BOTH sides and the
    // update freezes at uniform — overlap is what makes the
    // re-scored mixture move)
    val docs = (
      (1 to 8).map(i => (i.toLong, "web", "the quick brown fox and the lazy dog " + i)) ++
      Seq((100L, "code", "def fn the return x y and z lambda val"),
        (101L, "code", "class impl the object match and case trait"))
    ).toDF("doc_id", "source", "text")
    val out = Sampling.doremiWeightsIter(docs, "text", "source", rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(4)))).toMap
    assert(out.size === 8, "4 rounds x 2 sources")
    for (r <- 1 to 4) {
      val sum = out((r.toLong, "web"))._2 + out((r.toLong, "code"))._2
      assert(math.abs(sum - 1.0) < 1e-5, s"round $r weights must renormalize: $sum")
    }
    // the source the round-1 mixture under-serves (larger excess KL)
    // must gain weight across rounds
    val (hi, lo) =
      if (out((1L, "web"))._1 > out((1L, "code"))._1) ("web", "code")
      else ("code", "web")
    assert(out((1L, hi))._1 > out((1L, lo))._1)
    assert(out((4L, hi))._2 > out((1L, hi))._2,
      s"the under-served source ($hi) must gain weight across rounds")
    // mirror-ascent convergence: successive weight steps shrink
    def step(r: Int) = math.abs(out((r.toLong, hi))._2 -
      out(((r - 1).toLong, hi))._2)
    assert(step(3) <= step(2) + 1e-9 && step(4) <= step(3) + 1e-9,
      s"L1 steps must shrink: ${step(2)}, ${step(3)}, ${step(4)}")
    // the excess is re-scored against the REWEIGHTED mixture: the
    // per-round KL gap between the sources must close monotonically
    // toward the KL-equalizing fixed point
    def gap(r: Int) = math.abs(out((r.toLong, "web"))._1 -
      out((r.toLong, "code"))._1)
    assert(gap(2) < gap(1) && gap(3) < gap(2) && gap(4) < gap(3),
      s"KL gap must close: ${(1 to 4).map(gap).mkString(", ")}")
  }

  test("decontaminateSemantic batch form: empty eval set and null " +
    "embeddings keep every corpus vector in the audit") {
    import graft.datapipe.Similarity
    val emb = Seq(
      (1L, Some(Seq(1.0, 0.0))), (2L, Option.empty[Seq[Double]]),
      (3L, Some(Seq(0.0, 1.0))))
      .toDF("vec_id", "emb")
    val evalSet = Seq((9L, Seq(1.0, 0.05))).toDF("eval_id", "eval_emb")
    val out = Similarity.decontaminateSemantic(emb, evalSet, 0.95)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2))))
      .toMap
    assert(out.size === 3, "every corpus vector is scored — nulls included")
    assert(out(1L)._2 && !out(3L)._2)
    assert(out(2L) === ((None, false)),
      "a null embedding reads (null max, contaminated=false)")
    val empty = Similarity.decontaminateSemantic(emb,
      evalSet.filter(col("eval_id") < 0), 0.95).collect()
    assert(empty.length === 3 && empty.forall(r => !r.getBoolean(2)),
      "an empty eval set must verdict all-false, not drop the corpus")
  }

  test("decodeWav fails loudly on malformed bytes: negative chunk " +
    "size (would loop forever) and non-16-bit PCM (would mis-decode)") {
    import graft.datapipe.Multimodal
    val good = Multimodal.encodeWav(8000, Array[Short](1, 2, 3))
    assert(Multimodal.decodeWav(good)._2.sameElements(Array[Short](1, 2, 3)))
    // corrupt the fmt chunk size to -8: pos += 8 + sz would walk in
    // place — the guard must throw instead
    val negSize = good.clone()
    val bb = java.nio.ByteBuffer.wrap(negSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, -8)
    val e1 = intercept[IllegalArgumentException] { Multimodal.decodeWav(negSize) }
    assert(e1.getMessage.contains("chunk size"))
    // claim 8 bits/sample: the 2-byte stride would silently mis-read
    val bad8 = good.clone()
    java.nio.ByteBuffer.wrap(bad8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(34, 8)
    val e2 = intercept[IllegalArgumentException] { Multimodal.decodeWav(bad8) }
    assert(e2.getMessage.contains("PCM16"))
  }
}
