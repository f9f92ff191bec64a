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
}
