package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.PromHistogram
import graft.ops.EnvelopeOps

/** The SURVEY §5.3 property invariants that need a SparkSession
  * (PropertySpec holds the pure-JVM ones): scalacheck-generated
  * inputs are batched into DataFrames and the invariant is asserted
  * over every row, so each test is a property check at DataFrame
  * granularity rather than one hand-picked example.
  */
class SparkPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sampleN[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("normalize ∘ denormalize is identity on generated credentials") {
    val creds = sampleN(PropertySpec.genCredential, 60)
    val df = creds.toDS().select(struct(col("*")).as("cred"))
    val back = df.select(col("cred"),
      EnvelopeOps.normalizeContext(
        EnvelopeOps.denormalizeContext(col("cred"))).as("back"))
    // field-by-field: the rename shifts field ORDER, which JSON-object
    // semantics don't observe, so whole-struct equality would be wrong
    val bad = back.filter(!(
      col("back.context") === col("cred.context") &&
        col("back.id") === col("cred.id") &&
        col("back.issuanceDate") === col("cred.issuanceDate") &&
        col("back.issuer") === col("cred.issuer") &&
        col("back.credentialSubject") === col("cred.credentialSubject") &&
        col("back.proof") === col("cred.proof") &&
        col("back.type") === col("cred.type")))
    assert(bad.isEmpty)
  }

  test("cumulative histogram counts are monotone and end at the total") {
    val buckets = Array(0.0, 1.0, 10.0, 100.0)
    val labels = Array("0", "1", "10", "100", "+Inf")
    val values = sampleN(Gen.chooseNum(-1e6, 1e6), 500) ++
      Seq(0.0, 1.0, 10.0, 100.0, -1e9, 1e9) // bucket edges + outliers
    val out = values.toDF("v")
      .select(PromHistogram.column(buckets, labels, col("v")).as("h"))
      .as[Seq[(String, Long)]].head()
    val counts = out.map(_._2)
    assert(out.map(_._1) === labels.toSeq)
    assert(counts.zip(counts.tail).forall { case (a, b) => a <= b },
      s"cumulative counts must be monotone: $counts")
    assert(counts.last === values.length.toLong,
      "+Inf bucket must equal the total count")
  }

  test("broadcast-join misses are exactly the symbols outside the dim") {
    val symGen = Gen.oneOf((1 to 40).map(i => s"SYM$i"))
    val dimSyms = sampleN(symGen, 25).distinct
    val eventSyms = sampleN(symGen, 300)
    val events = eventSyms.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("event_id", "symbol")
    val dim = dimSyms.map(s => (s, s"cred-$s")).toDF("symbol", "credential")
    val misses = events.join(broadcast(dim), Seq("symbol"), "left_anti")
      .select("symbol").distinct().as[String].collect().toSet
    assert(misses === eventSyms.toSet.diff(dimSyms.toSet))
  }

  // Seeded generator for the round-5 properties: reproducible word
  // salads (a failing seed replays exactly).
  private def saladDocs(seed: Long, nDocs: Int): IndexedSeq[Array[String]] = {
    val rng = new scala.util.Random(seed)
    val vocab = (0 until 20).map(i => s"v$i")
    (0 until nDocs).map { _ =>
      Array.fill(10 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
    }
  }

  test("shared spans are real shared runs, maximal, and find planted blocks") {
    val rng = new scala.util.Random(7L)
    val base = saladDocs(11L, 20)
    // plant an identical 8-token block into each (2i, 2i+1) pair at
    // random offsets; block words are OUTSIDE the salad vocab so the
    // planted span cannot be confused with salad coincidences
    val planted = (0 until 10).map { i =>
      Array.fill(8)(s"b${i}_${rng.nextInt(3)}")
    }
    val toks: IndexedSeq[Array[String]] = base.zipWithIndex.map { case (doc, j) =>
      val block = planted(j / 2)
      val at = rng.nextInt(doc.length)
      doc.take(at) ++ block ++ doc.drop(at)
    }
    val docs = toks.zipWithIndex
      .map { case (w, id) => (id.toLong, w.mkString(" ")) }
      .toDF("id", "text")
    val spans = graft.datapipe.Dedup
      .sharedSpans(docs, "id", "text", k = 3, minWindows = 3, maxDf = 10000)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt,
        r.getLong(3).toInt, r.getLong(5).toInt))
    assert(spans.nonEmpty)
    for ((a, b, as, bs, len) <- spans) {
      // soundness: the reported slices are literally identical
      assert(toks(a).slice(as, as + len).sameElements(toks(b).slice(bs, bs + len)),
        s"span ($a,$b,$as,$bs,$len) is not a shared run")
      // maximality: extending one token either way breaks equality or
      // runs off an edge (no window was df-capped at maxDf=10000)
      assert(as == 0 || bs == 0 || toks(a)(as - 1) != toks(b)(bs - 1),
        s"span ($a,$b,$as,$bs,$len) extends left")
      assert(as + len == toks(a).length || bs + len == toks(b).length ||
        toks(a)(as + len) != toks(b)(bs + len),
        s"span ($a,$b,$as,$bs,$len) extends right")
    }
    // completeness: every planted pair surfaces a span covering its block
    for (i <- 0 until 10) {
      val (a, b) = (2 * i, 2 * i + 1)
      val aAt = toks(a).indexOfSlice(planted(i))
      val bAt = toks(b).indexOfSlice(planted(i))
      assert(spans.exists { case (sa, sb, as, bs, len) =>
        sa == a && sb == b && as <= aAt && bs <= bAt &&
          as + len >= aAt + 8 && bs + len >= bAt + 8
      }, s"planted block $i not covered by any span")
    }
  }

  test("bloom incremental dedup equals the plain anti join on generated corpora") {
    val corpusToks = saladDocs(23L, 120)
    val corpus = corpusToks.zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toDF("doc_id", "text")
    // new batch: half re-ingests of corpus docs, half fresh
    val rng = new scala.util.Random(29L)
    val fresh = ((0 until 30).map { i =>
      (1000L + i, corpusToks(rng.nextInt(corpusToks.size)).mkString(" "))
    } ++ saladDocs(31L, 30).zipWithIndex.map { case (w, i) =>
      (2000L + i, w.mkString(" ") + " uniquely new")
    }).toDF("doc_id", "text")
    val viaBloom = graft.datapipe.Dedup
      .bloomNewDocs(fresh, corpus, "doc_id", "text", expectedItems = 1000)
      .as[Long].collect().toSet
    val plain = fresh
      .select(col("doc_id"),
        graft.datapipe.TextAnalysis.normalize(col("text")).as("t"))
      .join(corpus.select(
        graft.datapipe.TextAnalysis.normalize(col("text")).as("t")),
        Seq("t"), "left_anti")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(viaBloom === plain)
    assert((2000L until 2030L).toSet.subsetOf(viaBloom),
      "the genuinely-new docs all survive")
  }

  test("importance weights vanish when the target IS the corpus") {
    // target == raw → identical counts and totals, so every bucket's
    // log ratio is exactly 0 and every document weighs exactly 0.0
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = graft.datapipe.LanguageModel.importanceWeights(
      docs, "doc_id", "text", lit(true), buckets = 32, topN = 10)
    assert(out.filter(col("weight") =!= 0.0).isEmpty,
      "all weights must be exactly 0.0")
    assert(out.filter(col("selected")).count() === 10)
  }

  test("perplexity is bounded by the smoothed-vocabulary worst case") {
    // p(w2|w1) >= 1/(c1+V) >= 1/(total bigrams + V), so per-doc
    // perplexity can never exceed total_bigrams + V; and ppl >= 1
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = graft.datapipe.LanguageModel.perplexity(docs, "doc_id", "text")
      .filter(col("ppl").isNotNull)
    val toksAll = docs.select(
      split(graft.datapipe.TextAnalysis.normalize(col("text")), " ").as("w"))
    val v = toksAll.select(explode(col("w")).as("t"))
      .agg(count_distinct(col("t"))).as[Long].head()
    val totalBigrams = toksAll
      .agg(sum(greatest(size(col("w")) - 1, lit(0)))).as[Long].head()
    val mx = out.agg(max(col("ppl"))).as[Double].head()
    val mn = out.agg(min(col("ppl"))).as[Double].head()
    assert(mx <= totalBigrams + v, s"ppl $mx exceeds ${totalBigrams + v}")
    assert(mn >= 1.0, s"ppl $mn below 1")
  }

  test("bpe token counts sit between word and character counts") {
    // pinned sample: enc and chars below are separate actions over
    // this plan, so an unordered limit could hand them different rows
    val docs = graft.sources.Tables.documents(spark, sf)
      .orderBy(col("doc_id")).limit(200)
    val enc = graft.datapipe.BpeTokenizer.trainAndEncode(
      docs, "doc_id", "text", 8)
    val chars = docs.select(col("doc_id"),
      aggregate(split(graft.datapipe.TextAnalysis.normalize(col("text")), " "),
        lit(0L), (acc, w) => acc + length(w)).as("n_chars_tok"))
    val joined = enc.join(chars, "doc_id")
      .filter(!(col("n_bpe_tokens") >= col("n_words") &&
        col("n_bpe_tokens") <= col("n_chars_tok")))
    assert(joined.isEmpty,
      "every doc must satisfy n_words <= n_bpe_tokens <= n_token_chars")
  }

  test("semantic dedup keeps everything at an unreachable threshold") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val out = graft.datapipe.Similarity.semanticDedup(
      emb, k = 4, iters = 2, threshold = 1.1)
    assert(out.filter(!col("keep")).isEmpty, "nothing can exceed cos 1.1")
    assert(out.count() === emb.count())
  }

  test("bpe: both training paths agree on adversarial generated corpora") {
    // a 4-letter alphabet forces dense pair-count ties, stressing the
    // (count DESC, pair ASC) tie-break in both substrates
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(6))("abcd"(rnd.nextInt(4))).mkString)
      val docs = words.grouped(5).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val mem = graft.datapipe.BpeTokenizer.train(docs, "text", 5)
      val dist = graft.datapipe.BpeTokenizer.trainDistributed(docs, "text", 5)
      assert(mem.merges === dist.merges, s"trial $trial merges diverge")
      def st(m: graft.datapipe.BpeTokenizer.BpeModel) =
        m.vocab.select(col("w"), col("cnt"), col("syms")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(st(mem) === st(dist), s"trial $trial vocab states diverge")
    }
  }

  test("sq8 dequantization error stays within half a quantization step") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    val m = graft.datapipe.Similarity.sq8MaxAbs(emb.select(col("emb")))
    val rows = emb.select(col("emb"),
      graft.datapipe.Similarity.sq8Quantize(col("emb"), m).as("q"))
      .as[(Seq[Double], Seq[Long])].collect()
    val step = m / 127.0
    for ((x, q) <- rows; (xi, qi) <- x.zip(q)) {
      assert(math.abs(qi * step - xi) <= step / 2 + 1e-9,
        s"dequant error for $xi → $qi exceeds half a step")
    }
  }

  // --- round-11 operator invariants -----------------------------

  private val wordGen: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "bad", "worse", "the")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))

  test("blocklist gate invariants on generated corpora: " +
    "hit counts bounded by token counts, distinct ≤ occurrences ≤ tokens") {
    val texts = sampleN(textGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = graft.datapipe.TextAnalysis.blocklistGate(
      texts.toDF("doc_id", "text"), "doc_id", "text",
      Seq("bad", "worse"), maxHitPct = 10).collect()
    for (r <- out if !r.isNullAt(1)) {
      val (n, hits, dist) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dist <= hits && hits <= n && dist <= 2,
        s"bounds violated: n=$n hits=$hits distinct=$dist")
      if (n > 0)
        assert(math.abs(r.getDouble(4) - hits.toDouble / n) < 1e-6 + 1e-9)
    }
  }

  test("containment scores on generated corpora stay in [threshold, 1]") {
    val texts = sampleN(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = graft.datapipe.Dedup.containmentPairs(
      texts.toDF("id", "text"), "id", "text", k = 2, threshold = 0.6)
      .collect()
    for (r <- out) {
      val c = r.getDouble(3)
      assert(c >= 0.6 - 1e-12 && c <= 1.0 + 1e-12,
        s"containment $c outside [0.6, 1]")
    }
    graft.datapipe.Staging.releaseAll()
  }

  test("Kneser-Ney per-position probabilities yield finite positive ppl") {
    val texts = sampleN(textGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val out = graft.datapipe.LanguageModel.perplexityKneserNey(
      df.filter(col("doc_id") % 3 =!= 0), df, "doc_id", "text").collect()
    for (r <- out) {
      if (r.getLong(1) > 0) {
        val ppl = r.getDouble(2)
        // the add-one continuation floor guarantees P > 0 at every
        // position, so ppl is finite; P ≤ 1 is NOT guaranteed by
        // interpolated KN on degenerate corpora, but positivity is
        assert(!ppl.isNaN && !ppl.isInfinite && ppl > 0.0,
          s"ppl must be finite positive, got $ppl")
      } else assert(r.isNullAt(2), "a doc with no bigrams has NULL ppl")
    }
  }

  test("winnowing index covers every document with at least one gram") {
    val texts = sampleN(textGen, 100).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val withGrams = texts.count { case (_, t) =>
      t.split(" ").count(_.nonEmpty) >= 3 }
    val covered = graft.datapipe.Dedup.winnowing(df, "doc_id", "text")
      .select(col("doc_id")).distinct().count()
    assert(covered === withGrams.toLong,
      "every document with ≥ 1 k-gram gets ≥ 1 fingerprint, no others")
  }
}
