package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{Classifier, Dedup, TextAnalysis}

/** Semantics + plan contracts for the round-11 operators: blocklist
  * gate (T109), keep-best dedup (T110), discriminative terms (T111),
  * top n-grams (T112).
  */
class RoundElevenOpsSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  // --- T109 blocklist gate --------------------------------------

  test("blocklistGate: counts, distinct counts, gate rules, NULL cases") {
    val docs = Seq(
      (1L, "the bad word bad again"),        // bad ×2, 1 distinct
      (2L, "bad and worse here today now"),  // 2 distinct → blocked
      (3L, "clean text only"),
      (4L, ""),                              // 0 tokens
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistGate(docs, "doc_id", "text",
      Seq("bad", "worse"), maxHitPct = 30)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) === 2L, "two occurrences of 'bad'")
    assert(out(1L).getLong(3) === 1L, "one distinct hit")
    assert(out(1L).getBoolean(5),
      "2 hits in 5 tokens = 40% > 30% → blocked on the fraction rule")
    assert(out(2L).getLong(3) === 2L && out(2L).getBoolean(5),
      "two distinct blocklisted terms → blocked regardless of fraction")
    assert(!out(3L).getBoolean(5) && out(3L).getLong(2) === 0L)
    assert(out(4L).getLong(1) === 0L && out(4L).isNullAt(4),
      "zero-token document: NULL hit_frac")
    assert(out(5L).isNullAt(1) && out(5L).isNullAt(4),
      "NULL text propagates NULL counts")
    assertThrows[IllegalArgumentException](
      TextAnalysis.blocklistGate(docs, "doc_id", "text", Seq.empty))
  }

  test("blocklistGate plan: zero shuffle — the gate streams statelessly") {
    val out = TextAnalysis.blocklistGate(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      Seq("slow", "vector"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"blocklist gate must be a per-row projection; plan:\n${p.take(1500)}")
  }

  // --- T110 keep-best dedup -------------------------------------

  test("keepBest: survives the highest-priority copy; NULLs sort last") {
    val docs = Seq(
      (1L, "same text", Some(0.3)),
      (2L, "same text", Some(0.9)),   // best of the trio
      (3L, "same text", None),        // NULL priority never wins
      (4L, "unique", Some(0.1)))
      .toDF("doc_id", "text", "priority")
    val out = Dedup.keepBest(docs, "doc_id", col("text"), col("priority"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getBoolean(3) && !out(1L).getBoolean(3) &&
      !out(3L).getBoolean(3), "copy with priority 0.9 is the keeper")
    assert(out(1L).getLong(1) === 3L, "trio multiplicity")
    assert(out(4L).getBoolean(3) && out(4L).getLong(1) === 1L)
    // exactly one keeper per group, all rows audited
    val kept = Dedup.keepBest(docs, "doc_id", col("text"), col("priority"))
    assert(kept.count() === 4L)
    assert(kept.filter(col("keep")).count() === 2L)
  }

  test("keepBest: equal priorities fall to min doc_id (the keep-one rule)") {
    val docs = Seq((7L, "t", 0.5), (5L, "t", 0.5), (9L, "t", 0.5))
      .toDF("doc_id", "text", "priority")
    val keeper = Dedup.keepBest(docs, "doc_id", col("text"), col("priority"))
      .filter(col("keep")).select(col("doc_id")).as[Long].collect()
    assert(keeper.toSeq === Seq(5L))
  }

  test("keepBest plan: one fp-keyed exchange feeds both windows") {
    val out = Dedup.keepBest(spark.read.parquet(s"$sf/documents.parquet"),
      "doc_id", col("text"), col("n_chars").cast("double"))
    val p = out.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"rank and count must share the fp partitioning, got $exchanges exchanges")
  }

  // --- T111 discriminative terms --------------------------------

  test("discriminativeTerms: log-odds match a brute-force replay") {
    val docs = Seq(
      ("good good good nice", true), ("good nice fine", true),
      ("bad bad bad ugly", false), ("bad ugly sad", false))
      .toDF("text", "is_pos")
    val out = Classifier.discriminativeTerms(docs, "text", col("is_pos"),
      k = 10, minCount = 1L)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // brute force: V=6 terms (good,nice,fine,bad,ugly,sad), tp=7, tn=7
    val v = 6; val tp = 7; val tn = 7
    def lr(np: Long, nn: Long): Double =
      BigDecimal(math.log((np + 1.0) / (tp + v)) -
        math.log((nn + 1.0) / (tn + v)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("good") === ((4L, 0L, lr(4, 0))))
    assert(out("bad") === ((0L, 4L, lr(0, 4))))
    assert(out.size === 6)
    // ordering: the largest |lr| first → good/bad before sad/fine
    val ordered = Classifier.discriminativeTerms(docs, "text",
      col("is_pos"), k = 2, minCount = 1L)
      .select(col("term")).as[String].collect().toSet
    assert(ordered === Set("good", "bad"))
  }

  test("discriminativeTerms plan: distributed top-k, no global sort") {
    val out = Classifier.discriminativeTerms(
      spark.read.parquet(s"$sf/documents.parquet"), "text",
      lit(true), k = 50)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"the |lr| cut must be per-partition heaps; plan:\n${p.take(1500)}")
    assert(!p.contains("rangepartitioning"),
      "the vocabulary must never be globally sorted")
  }

  // --- T112 top n-grams -----------------------------------------

  test("topNgrams: windows, counts, and the short-document guard") {
    val docs = Seq("a b a b c", "a b", "x").toDF("text")
    val out = TextAnalysis.topNgrams(docs, "text", Seq(2, 3), k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out((2L, "a b")) === 3L, "two in doc1 + one in doc2")
    assert(out((2L, "b a")) === 1L)
    assert(out((2L, "b c")) === 1L)
    assert(out((3L, "a b a")) === 1L)
    assert(out((3L, "a b c")) === 1L)
    assert(!out.contains((2L, "x")) && !out.keys.exists(_._2.contains("x")),
      "a one-token document contributes no n-gram")
    assertThrows[IllegalArgumentException](
      TextAnalysis.topNgrams(docs, "text", Seq(2, 2), k = 10))
    assertThrows[IllegalArgumentException](
      TextAnalysis.topNgrams(docs, "text", Seq.empty, k = 10))
  }

  test("topNgrams plan: per-n distributed top-k cut before the union") {
    val out = TextAnalysis.topNgrams(
      spark.read.parquet(s"$sf/documents.parquet"), "text", Seq(2, 3), 20)
    val p = out.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("TakeOrderedAndProject")) === 2,
      s"each n gets its own bounded cut; plan:\n${p.take(1500)}")
    assert(!p.contains("rangepartitioning"),
      "the n-gram table must never be globally sorted")
  }

  // --- T113 winnowing -------------------------------------------

  test("winnowing: the shared-run guarantee and the short-doc floor") {
    // two documents sharing a run of window + k - 1 = 6 tokens MUST
    // share at least one fingerprint (the winnowing guarantee)
    val shared = "p q r s t u"
    val docs = Seq(
      (1L, s"a b c d $shared e f g h"),
      (2L, s"x y z $shared w v"),
      (3L, "one two three"),   // 1 gram < window → global-min floor
      (4L, ""))                // no grams → nothing
      .toDF("doc_id", "text")
    val fps = Dedup.winnowing(docs, "doc_id", "text", k = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "documents sharing a 6-token run share a fingerprint")
    assert(byDoc(3L).size === 1,
      "a document with fewer grams than the window keeps its global min")
    assert(!byDoc.contains(4L), "an empty document yields nothing")
    // fingerprints are a subset of the document's own gram hashes
    val grams1 = "a b c d p q r s t u e f g h".split(" ").sliding(3)
      .map(_.mkString(" ")).toSeq
    import org.apache.spark.sql.functions.{col => c}
    val hashes1 = grams1.toDF("g")
      .select(TextAnalysis.md5Long60(c("g"))).as[Long].collect().toSet
    assert(byDoc(1L).subsetOf(hashes1))
  }

  test("winnowing plan: zero exchange — per-row selection, fan-out only") {
    val out = Dedup.winnowing(spark.read.parquet(s"$sf/documents.parquet"),
      "doc_id", "text")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"winnowing must stream statelessly; plan:\n${p.take(1500)}")
  }

  // --- T114 containment pairs -----------------------------------

  test("containmentPairs: a strict shingle-subset is contained at 1.0, " +
    "and the relation is asymmetric") {
    // b = a plus a distinct tail → every shingle of a appears in b
    val docs = Seq(
      (1L, "m1 m2 m3 m4 m5 m6"),
      (2L, "m1 m2 m3 m4 m5 m6 z1 z2 z3 z4 z5 z6 z7 z8 z9"),
      (3L, "q1 q2 q3 q4 q5"))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(docs, "id", "text",
      k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((1L, 2L))._2 === 1.0, "subset side contains at 1.0")
    assert(out.get((2L, 1L)).forall(_._2 < 1.0),
      "the superset direction scores strictly lower (or below threshold)")
    assert(!out.keys.exists(p => p._1 == 3L || p._2 == 3L),
      "a disjoint document pairs with nothing")
  }

  test("containmentPairs plan: shuffled-hash candidate join, " +
    "posting lists never sort-merged") {
    val out = Dedup.containmentPairs(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").as("id"), col("text")), "id", "text")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"the prefix-vs-full posting join must hash, not sort; plan:\n${p.take(1500)}")
    graft.datapipe.Staging.releaseAll()
  }

  // --- T116 winnowing matches -----------------------------------

  test("winnowMatches: documents sharing a long run pair up; " +
    "disjoint documents never do; hot fingerprints are capped out") {
    val run = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = Seq(
      (1L, s"a1 a2 a3 $run a4 a5"),
      (2L, s"b1 b2 $run b3 b4 b5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowMatches(docs, "doc_id", "text",
      minShared = 2, maxDocFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((1L, 2L)), "the shared 8-token run must pair 1-2")
    assert(out.keySet === Set((1L, 2L)), "doc 3 pairs with nothing")
    // with every fingerprint capped out, no pair survives
    val capped = Dedup.winnowMatches(docs, "doc_id", "text",
      minShared = 2, maxDocFreq = 0)
    assert(capped.count() === 0L)
    graft.datapipe.Staging.releaseAll()
  }

  test("winnowMatches plan: fp self-join hashes, hot set broadcasts anti") {
    val out = Dedup.winnowMatches(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"the fp self-join must hash, not sort; plan:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "the hot-fp cap must broadcast the tiny hot set into an anti join")
    graft.datapipe.Staging.releaseAll()
  }

  // --- T117 per-source contamination ----------------------------

  test("decontam_by_source is consistent with the per-doc scorer") {
    import graft.datapipe.Contamination
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val perDoc = Contamination.score(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0), "doc_id", "text", k = 3)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val expected = perDoc.groupBy(col("source"))
      .agg(sum(col("n_shared")).as("s"), sum(col("n_shingles")).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val rolled = SparkEntry.queries("decontam_by_source")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(rolled === expected,
      "the rollup's integer sums must equal the per-doc scorer's")
  }

  // --- T119 curriculum ordering ---------------------------------

  test("curriculumOrder: stages cut at exact token thirds in " +
    "(difficulty, doc_id) order; zero-token docs drop") {
    import graft.datapipe.Sampling
    // 6 docs x 10 tokens, difficulty = doc_id → thirds are clean
    val docs = (1L to 6L).map(i => (i, 10L, i)).toDF("doc_id", "n", "diff")
      .union(Seq((7L, 0L, 7L)).toDF("doc_id", "n", "diff"))
    val out = Sampling.curriculumOrder(docs, "doc_id", col("n"), col("diff"))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4)))
      .toMap
    assert(out(1L) === ((10L, "warmup")) && out(2L) === ((20L, "warmup")))
    assert(out(3L) === ((30L, "main")) && out(4L) === ((40L, "main")))
    assert(out(5L) === ((50L, "anneal")) && out(6L) === ((60L, "anneal")))
    assert(!out.contains(7L), "a zero-token document occupies no stage")
  }

  test("curriculumOrder: a non-numeric doc id aborts loudly instead of " +
    "silently dropping rows") {
    import graft.datapipe.Sampling
    val docs = Seq(("doc-a", 10L, 1L), ("2", 10L, 2L))
      .toDF("doc_id", "n", "diff")
    val e = intercept[Exception] {
      Sampling.curriculumOrder(docs, "doc_id", col("n"), col("diff"))
        .collect()
    }
    assert(e.getMessage.contains("non-numeric") ||
      Option(e.getCause).exists(_.getMessage.contains("non-numeric")),
      s"expected the numeric-id contract error, got: ${e.getMessage}")
  }

  test("containmentPairs: rejects out-of-range threshold and k loudly") {
    import graft.datapipe.Dedup
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(docs, "id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(docs, "id", "text", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(docs, "id", "text", threshold = 1.5)
    }
  }

  test("curriculumOrder plan: no corpus-wide window, total broadcasts") {
    val er = graft.functions.ExactRound
    val nTok = graft.datapipe.TextAnalysis.tokenCount(col("text"))
    val out = graft.datapipe.Sampling.curriculumOrder(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", nTok,
      er.ratioScaled(nTok, nTok, 6))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"the running sum must be the distributed prefix scan; plan:\n${p.take(1500)}")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the scalar total must broadcast")
  }

  // --- T115 Kneser-Ney perplexity -------------------------------

  test("perplexityKneserNey: matches a hand-computed replay; unseen " +
    "contexts fall to the continuation floor") {
    import graft.datapipe.LanguageModel
    val train = Seq("a b a c", "a b c").toDF("text")
      .withColumn("doc_id", lit(0L))
    // score a doc whose second bigram has an unseen context
    val docs = Seq((1L, "a b"), (2L, "z q")).toDF("doc_id", "text")
    val out = LanguageModel.perplexityKneserNey(train, docs,
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // train bigrams: (a,b)x2 (b,a) (a,c) (b,c); c2: ab=2, ba=1, ac=1, bc=1
    // left: a->(cu=3,n1l=2) b->(cu=2,n1l=2); right(n1r): b=1,a=1,c=2
    // nn=4 distinct bigrams, v=3 vocab
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pcB = (1.0 + 1) / (4 + 3)         // n1r(b)=1
    val pAB = (math.max(2 - 0.75, 0) + 0.75 * 2 * pcB) / 3.0
    assert(out(1L) === ((1L, r4(math.exp(-r8(math.log(pAB)) / 1)))))
    // both 'z' context and 'q' continuation unseen → floor (0+1)/(4+3)
    val pZQ = (0.0 + 1) / (4 + 3)
    assert(out(2L) === ((1L, r4(math.exp(-r8(math.log(pZQ)) / 1)))))
  }
}
