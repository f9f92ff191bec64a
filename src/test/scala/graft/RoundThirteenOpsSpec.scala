package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{Preference, Sampling, SftPrep, TextAnalysis}

/** Value-level contracts of the round-13 wave
  * ([[SftPrep.fimTransform]], [[Preference.bestOfN]],
  * [[Sampling.doremiWeights]],
  * [[graft.datapipe.Classifier.temperatureFit]]) — hand-built
  * examples, driver replays of the hash/NLL arithmetic, and the
  * invariants the DuckDB oracle's fixed shape cannot reach. The
  * corpus-scale certification is the oracle gate (`sft_fim`,
  * `pref_best_of_n`, `mix_doremi`, `clf_temperature`).
  */
class RoundThirteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("fimTransform: a driver replay of the hash arithmetic and both " +
    "sentinel layouts reproduces every output column, including the " +
    "empty- and null-document pass-throughs") {
    val texts = Seq(
      0L -> "abcdefghij", 1L -> "hello world fill me", 2L -> "",
      3L -> (null: String), 5L -> "xyz", 7L -> "the quick brown fox",
      11L -> "a", 13L -> "fill in the middle of this sentence please")
    val df = texts.toDF("doc_id", "text")
    val out = SftPrep.fimTransform(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    for ((id, text) <- texts) {
      val r = out(id)
      if (text == null) {
        assert(r.getString(1) === "orig" && r.isNullAt(5) && r.isNullAt(6))
      } else if (text.isEmpty) {
        assert(r.getString(1) === "orig")
        assert(r.getLong(5) === 0L && r.getString(6) === md5hex(""))
      } else {
        val n = text.length.toLong
        val m0 = h60(s"fim_m:$id") % 4
        val a = 1 + h60(s"fim_a:$id") % n
        val b = 1 + h60(s"fim_b:$id") % n
        val (lo, hi) = (math.min(a, b).toInt, math.max(a, b).toInt)
        val (pre, mid, suf) =
          (text.substring(0, lo - 1), text.substring(lo - 1, hi - 1),
            text.substring(hi - 1))
        val (mode, expect) =
          if (m0 < 2) ("orig", text)
          else if (m0 == 2) ("psm", s"<PRE>$pre<SUF>$suf<MID>$mid")
          else ("spm", s"<SUF>$suf<PRE>$pre<MID>$mid")
        assert(r.getString(1) === mode, s"id $id mode")
        if (mode != "orig") {
          assert(r.getLong(2) === pre.length.toLong, s"id $id n_prefix")
          assert(r.getLong(3) === mid.length.toLong, s"id $id n_middle")
          assert(r.getLong(4) === suf.length.toLong, s"id $id n_suffix")
          assert(r.getLong(5) === n + 15, "three 5-char sentinels")
        } else assert((2 to 4).forall(i => r.getLong(i) === 0L))
        assert(r.getString(6) === md5hex(expect), s"id $id md5")
      }
    }
  }

  test("fimTransform: on the fixture corpus the segments partition every " +
    "transformed document and the FIM rate sits near the paper's 50%") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = SftPrep.fimTransform(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), length(col("text")).cast("bigint").as("n")),
        Seq("doc_id"))
      .collect()
    assert(out.nonEmpty)
    for (r <- out if r.getAs[String]("mode") != "orig") {
      assert(r.getAs[Long]("n_prefix") + r.getAs[Long]("n_middle") +
        r.getAs[Long]("n_suffix") === r.getAs[Long]("n"))
      assert(r.getAs[Long]("fim_len") === r.getAs[Long]("n") + 15)
    }
    val frac = out.count(_.getAs[String]("mode") != "orig").toDouble / out.length
    assert(frac > 0.35 && frac < 0.65, s"FIM rate drifted to $frac")
  }

  test("bestOfN: argmax with the smallest-id tie-break, the runner-up " +
    "margin, and singleton-group NULLs") {
    val df = Seq(
      ("g1", 1L, 5L), ("g1", 2L, 9L), ("g1", 3L, 9L), ("g1", 4L, 7L),
      ("g2", 10L, 4L)).toDF("grp", "id", "r")
    val out = Preference.bestOfN(df, "id", col("r"), Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getAs[Long]("n_candidates") === 4L)
    assert(g1.getAs[Long]("best_id") === 2L, "reward tie resolves to min id")
    assert(g1.getAs[Long]("best_reward") === 9L)
    assert(g1.getAs[Long]("second_reward") === 9L,
      "the runner-up is the other 9 — duplicates of the max count")
    assert(g1.getAs[Long]("margin") === 0L)
    val g2 = out("g2")
    assert(g2.getAs[Long]("n_candidates") === 1L)
    assert(g2.getAs[Long]("best_id") === 10L)
    assert(g2.isNullAt(g2.fieldIndex("second_reward")) &&
      g2.isNullAt(g2.fieldIndex("margin")))
  }

  test("doremiWeights: weights normalize to ~1, order follows the KL " +
    "(worse-modeled sources gain), and a single source takes weight 1") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = Sampling.doremiWeights(docs, "text", "source").collect()
    assert(out.length > 1)
    val wsum = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    val byKl = out.sortBy(_.getAs[Double]("kl"))
      .map(_.getAs[Double]("weight")).toSeq
    assert(byKl.zip(byKl.tail).forall { case (a, b) => a <= b + 1e-9 },
      "weight must be monotone in the excess signal")
    val one = Sampling.doremiWeights(
      docs.withColumn("source", lit("only")), "text", "source").collect()
    assert(one.length === 1 && one(0).getAs[Double]("weight") === 1.0)
  }

  test("temperatureFit: per-T NLL matches a driver replay under the " +
    "exact rounding conventions, and the argmin flag is unique") {
    val scored = Seq((4.0, true), (-4.0, false), (2.0, false),
      (-1.0, true), (0.5, true), (-0.25, false))
      .toDF("score", "y")
    val grid = Seq(0.5, 1.0, 2.0)
    val out = graft.datapipe.Classifier
      .temperatureFit(scored, "score", "y", grid)
      .collect().map(r => r.getDouble(0) -> r).toMap
    def round(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (t <- grid) {
      val terms = Seq((4.0, true), (-4.0, false), (2.0, false),
        (-1.0, true), (0.5, true), (-0.25, false)).map { case (s, y) =>
        val p0 = round(1.0 / (1.0 + math.exp(-s / t)), 6)
        val p = math.min(math.max(p0, 0.000001), 0.999999)
        round(-(if (y) math.log(p) else math.log(1.0 - p)), 8)
      }
      val nll = round(terms.map(BigDecimal(_)).sum.toDouble, 6)
      assert(out(t).getAs[Double]("nll") === nll, s"t = $t")
      assert(out(t).getAs[Long]("n_docs") === 6L)
    }
    assert(out.values.count(_.getAs[Boolean]("is_best")) === 1)
    val best = out.values.find(_.getAs[Boolean]("is_best")).get
    assert(best.getAs[Double]("nll") ===
      out.values.map(_.getAs[Double]("nll")).min)
  }

  test("lossMaskSpans: spans tile the renderConversations render exactly " +
    "— consecutive starts are end+2, the last end is the render length, " +
    "and the trains flag follows the alternating roles") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(200)
    val spans = SftPrep.lossMaskSpans(docs, "doc_id", "text")
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val renders = SftPrep.renderConversations(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(spans.nonEmpty && spans.keySet === renders.keySet)
    for ((id, rows) <- spans) {
      val sorted = rows.sortBy(_.getAs[Long]("turn_idx"))
      assert(sorted.head.getAs[Long]("char_start") === 1L, s"doc $id")
      for (Array(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(b.getAs[Long]("char_start") ===
          a.getAs[Long]("char_end") + 2L, s"doc $id: one \\n between turns")
      assert(sorted.last.getAs[Long]("char_end") ===
        renders(id).getAs[Long]("render_len"), s"doc $id covers the render")
      assert(sorted.length.toLong === renders(id).getAs[Long]("n_turns"))
      for (r <- sorted) {
        val even = r.getAs[Long]("turn_idx") % 2 == 0
        assert(r.getAs[String]("role") === (if (even) "user" else "assistant"))
        assert(r.getAs[Boolean]("trains") === !even,
          "loss trains on assistant turns only")
        assert(r.getAs[Long]("char_end") - r.getAs[Long]("char_start") + 1 ===
          r.getAs[Long]("span_chars"))
      }
    }
  }

  test("lossMaskSpans: a hand-built two-and-a-half-turn conversation " +
    "carries the exact offsets of its rendered template") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = SftPrep.lossMaskSpans(df, "doc_id", "text", turnTokens = 3)
      .collect().sortBy(_.getAs[Long]("turn_idx"))
    // renders: "<|user|> a b c <|eot|>" (22) \n
    //          "<|assistant|> d e f <|eot|>" (27) \n
    //          "<|user|> g <|eot|>" (18)
    assert(out.length === 3)
    assert(out.map(r => (r.getAs[Long]("char_start"),
      r.getAs[Long]("char_end"))).toSeq ===
      Seq((1L, 22L), (24L, 50L), (52L, 69L)))
    assert(out.map(_.getAs[Boolean]("trains")).toSeq ===
      Seq(false, true, false))
  }

  test("heapsFit: all-distinct-token documents read beta 1 / lnK 0; a " +
    "constant-length group reads NULL; n_docs counts only worded docs") {
    val rows = Seq(
      ("g1", "t1 t2"), ("g1", "u1 u2 u3 u4"), ("g1", "v1 v2 v3 v4 v5 v6 v7 v8"),
      ("g2", "a b c"), ("g2", "d e f"), ("g2", ""))
    val out = TextAnalysis.heapsFit(rows.toDF("source", "text"),
      "text", "source").collect().map(r => r.getString(0) -> r).toMap
    // g1: v = n on every doc, so ln v = ln n point-for-point: slope
    // 1, intercept 0 (both exact through the shared 8-dp rounding)
    assert(out("g1").getAs[Long]("n_docs") === 3L)
    assert(out("g1").getAs[Double]("heaps_beta") === 1.0)
    assert(out("g1").getAs[Double]("heaps_lnk") === 0.0)
    // g2: both worded docs have n = 3 — zero x-variance, NULL fit,
    // and the empty doc contributed no point
    assert(out("g2").getAs[Long]("n_docs") === 2L)
    assert(out("g2").isNullAt(out("g2").fieldIndex("heaps_beta")))
    assert(out("g2").isNullAt(out("g2").fieldIndex("heaps_lnk")))
    // the degeneracy decision must be EXACT (min x = max x on the
    // decimals) — the double-cast cancellation n·Σx²−(Σx)² reads
    // ~1e-15, not 0, for most constant-length groups (x²·10¹⁶
    // exceeds 2^53), which published a tiny/tiny garbage fit
    val const5 = (1 to 5).map(i =>
      ("c", s"a$i b$i")) // five docs, all length 2
    val c = TextAnalysis.heapsFit(const5.toDF("source", "text"),
      "text", "source").collect()(0)
    assert(c.isNullAt(c.fieldIndex("heaps_beta")),
      "a 5-doc constant-length group must read NULL, not tiny/tiny")
  }

  test("robustOutliers: lower-median/MAD arithmetic on a hand histogram, " +
    "with the heavy tail flagged and the median unmoved by it") {
    val lens = Seq(10, 10, 10, 10, 11, 11, 12, 12, 13, 1000)
    val df = lens.zipWithIndex.map { case (n, i) =>
      ("g", (1 to n).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("source", "text")
    val out = TextAnalysis.robustOutliers(df, "text", "source", k = 5)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_docs") === 10L)
    assert(r.getAs[Long]("med") === 11L,
      "lower median of 10 values is the 5th smallest")
    assert(r.getAs[Long]("mad") === 1L)
    assert(r.getAs[Long]("n_outliers") === 1L, "only the 1000-word doc")
    assert(r.getAs[Double]("outlier_frac") === 0.1)
    // even count: the LOWER median (2nd of 4), never the upper
    val even = Seq(1, 2, 3, 4).zipWithIndex.map { case (n, i) =>
      ("e", (1 to n).map(j => s"w${i}_$j").mkString(" "))
    }
    val re = TextAnalysis.robustOutliers(even.toDF("source", "text"),
      "text", "source").collect()(0)
    assert(re.getAs[Long]("med") === 2L, "lower median of 1,2,3,4")
    assert(re.getAs[Long]("mad") === 1L, "lower median of devs 0,1,1,2")
  }

  test("lengthBias: exact collinear rewards read corr 1 / the plant's " +
    "slope and intercept; zero length-variance reads all-NULL") {
    val pts = Seq((10L, 23L), (20L, 43L), (30L, 63L), (40L, 83L))
      .map { case (l, r) => ("g", r, l) }
    val out = Preference.lengthBias(pts.toDF("source", "r", "l"),
      col("r"), col("l"), Seq("source")).collect()(0)
    assert(out.getAs[Long]("n_pairs") === 4L)
    assert(out.getAs[Double]("corr") === 1.0)
    assert(out.getAs[Double]("slope") === 2.0)
    assert(out.getAs[Double]("intercept") === 3.0)
    val flat = Preference.lengthBias(
      Seq(("g", 5L, 7L), ("g", 9L, 7L)).toDF("source", "r", "l"),
      col("r"), col("l"), Seq("source")).collect()(0)
    assert(flat.isNullAt(flat.fieldIndex("corr")))
    assert(flat.isNullAt(flat.fieldIndex("slope")))
    assert(flat.isNullAt(flat.fieldIndex("intercept")))
  }

  test("cohenKappa: a driver replay of the integer-counts formula on " +
    "hand labels, and the constant-rater NULL") {
    // n=8: agree on 6 (4 TT, 2 FF); A marginal 5, B marginal 5
    val rows = Seq(
      (true, true), (true, true), (true, true), (true, true),
      (false, false), (false, false), (true, false), (false, true))
      .map { case (a, b) => ("g", a, b) }
    val out = Preference.cohenKappa(rows.toDF("source", "a", "b"),
      col("a"), col("b"), Seq("source")).collect()(0)
    assert(out.getAs[Long]("n_items") === 8L)
    assert(out.getAs[Long]("n_agree") === 6L)
    assert(out.getAs[Double]("po") === 0.75)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val peNum = 5.0 * 5.0 + 3.0 * 3.0
    assert(out.getAs[Double]("pe") === round6(peNum / 64.0))
    assert(out.getAs[Double]("kappa") ===
      round6((8.0 * 6.0 - peNum) / (64.0 - peNum)))
    val const = Preference.cohenKappa(
      Seq(("g", true, true), ("g", true, true)).toDF("source", "a", "b"),
      col("a"), col("b"), Seq("source")).collect()(0)
    assert(const.getAs[Double]("po") === 1.0)
    assert(const.isNullAt(const.fieldIndex("kappa")),
      "pe = 1 carries no information")
  }

  test("truncationProfile: hand vectors — prefix-heavy reads cosine 1, " +
    "prefix-empty reads 0, the zero vector drops from every statistic") {
    import graft.datapipe.Similarity
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), // all mass in the prefix
      (2L, Seq(0.0, 0.0, 1.0, 1.0)), // none in dim-2 prefix
      (3L, Seq(0.0, 0.0, 0.0, 0.0))) // no geometry at all
      .toDF("vec_id", "emb")
    val out = Similarity.truncationProfile(vecs, "emb", Seq(2, 4))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getAs[Long]("n_vecs") === 2L, "zero vector excluded")
    assert(out(2L).getAs[Double]("min_cos") === 0.0)
    assert(out(2L).getAs[Double]("mean_cos") === 0.5)
    assert(out(2L).getAs[Double]("frac_ge95") === 0.5)
    assert(out(4L).getAs[Double]("min_cos") === 1.0,
      "the full width preserves every non-zero vector exactly")
    assert(out(4L).getAs[Double]("mean_cos") === 1.0)
    // a width WIDER than the vectors must read NULL stats, never a
    // fake perfect retention (slice past the end returns everything)
    val wide = Similarity.truncationProfile(vecs, "emb", Seq(8))
      .collect()(0)
    assert(wide.getAs[Long]("n_vecs") === 0L)
    assert(wide.isNullAt(wide.fieldIndex("mean_cos")))
    assert(wide.isNullAt(wide.fieldIndex("min_cos")))
  }

  test("collocations: the glued pair outranks frequent-but-independent " +
    "pairs, the min-count gate drops rare pairs, and a driver replay " +
    "reproduces the PMI") {
    import graft.datapipe.TextAnalysis
    // "aa bb" always together (6 times); "cc" everywhere so any pair
    // with it has low PMI; "dd ee" appears only 4 times (below gate)
    val docs = (Seq.fill(6)("aa bb cc") ++ Seq.fill(4)("dd ee cc") ++
      Seq.fill(10)("cc ff cc gg")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5,
      topK = 10).collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("aa", "bb")))
    assert(!pairs.contains(("dd", "ee")), "4 < minCount 5")
    val top = out.head
    assert((top.getString(0), top.getString(1)) === ("aa", "bb"),
      "the always-glued pair carries the highest PMI")
    // driver replay: N = 70 tokens, c(aa)=c(bb)=6, c(aa,bb)=6
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Double]("pmi") ===
      round6(math.log((6.0 * 70.0) / (6.0 * 6.0))))
  }

  test("labelNoise: driver-replayed thresholds and flip counts on hand " +
    "scores, and the single-class NULL contract") {
    import graft.datapipe.Classifier
    // labeled-true: scores 4, 2, -3 (the -3 is confidently negative);
    // labeled-false: scores -4, -1, 3 (the 3 is confidently positive)
    val rows = Seq((4.0, true), (2.0, true), (-3.0, true),
      (-4.0, false), (-1.0, false), (3.0, false)).toDF("score", "y")
    val out = Classifier.labelNoise(rows, "score", "y")
      .collect().map(r => r.getBoolean(0) -> r).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sig(s: Double): Double = r6(1.0 / (1.0 + math.exp(-s)))
    def fold6(xs: Seq[Double]): BigDecimal =
      xs.map(BigDecimal(_)).sum
    val tTrue = r6((fold6(Seq(sig(4), sig(2), sig(-3))) / 3).toDouble)
    val tFalse = r6((fold6(Seq(sig(4), sig(1), sig(-3))) / 3).toDouble)
    assert(out(true).getAs[Double]("thr_own") === tTrue)
    assert(out(false).getAs[Double]("thr_own") === tFalse)
    assert(out(true).getAs[Double]("thr_other") === tFalse)
    // flips among labeled-true: p_false(s) = sig(-s) >= tFalse —
    // only the -3 qualifies (sig(3) ≈ .95 vs threshold ≈ .63)
    assert(out(true).getAs[Long]("n_flips") === 1L)
    assert(out(false).getAs[Long]("n_flips") === 1L, "the +3 example")
    val single = Classifier.labelNoise(
      Seq((1.0, true), (2.0, true)).toDF("score", "y"), "score", "y")
      .collect()
    assert(single.length === 1)
    assert(single(0).isNullAt(single(0).fieldIndex("n_flips")),
      "no opposite class, nothing to be confident about")
    // NULL labels are excluded explicitly, never a vanished group
    val withNulls = Classifier.labelNoise(
      Seq((1.0, java.lang.Boolean.TRUE), (2.0, java.lang.Boolean.TRUE),
        (3.0, null.asInstanceOf[java.lang.Boolean]))
        .toDF("score", "y"), "score", "y").collect()
    assert(withNulls.length === 1)
    assert(withNulls(0).getAs[Long]("n_labeled") === 2L,
      "the NULL-label row is excluded, not miscounted")
  }

  test("bootstrapCI: a driver replay of the Poisson-weight arithmetic " +
    "reproduces the interval, and a constant metric collapses it") {
    import graft.datapipe.Relevance
    val items = (0L until 40L).map(i => (i, i % 4 != 0)) // 75% pass
    val out = Relevance.bootstrapCI(items.toDF("doc_id", "ok"),
      "doc_id", col("ok"), reps = 50).collect()(0)
    assert(out.getAs[Long]("n_items") === 40L)
    assert(out.getAs[Long]("n_reps") === 50L)
    assert(out.getAs[Double]("pass_rate") === 0.75)
    // driver replay of all 50 rep estimates
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .take(15), 16)
    def weight(rep: Long, id: Long): Long =
      Relevance.PoissonCum.count(h60(s"boot:$rep:$id") % 1000000L >= _)
    def ratio6(a: Long, b: Long): Double =
      ((2 * a * 1000000 + b) / (2 * b)) / 1000000.0
    val ests = (0L until 50L).map { r =>
      val ws = items.map { case (id, ok) => (weight(r, id), ok) }
      (ratio6(ws.collect { case (w, true) => w }.sum, ws.map(_._1).sum), r)
    }.sortBy(e => (e._1, e._2)).map(_._1)
    assert(out.getAs[Double]("lo95") === ests(1), "rank ceil(.025*50)=2")
    assert(out.getAs[Double]("hi95") === ests(48), "rank ceil(.975*50)=49")
    val const = Relevance.bootstrapCI(
      items.map { case (i, _) => (i, true) }.toDF("doc_id", "ok"),
      "doc_id", col("ok"), reps = 50).collect()(0)
    assert(const.getAs[Double]("lo95") === 1.0 &&
      const.getAs[Double]("hi95") === 1.0 &&
      const.getAs[Double]("pass_rate") === 1.0)
  }

  test("fleissKappa: perfect three-rater agreement on mixed votes reads " +
    "kappa 1; a driver replay matches hand labels; a unanimous pool " +
    "reads NULL") {
    // perfect agreement, mixed pool: every rater says the same thing
    // per item, half the items positive
    val perfect = Seq((true, true, true), (false, false, false),
      (true, true, true), (false, false, false))
      .map { case (a, b, c) => ("g", a, b, c) }
    val p = Preference.fleissKappa(perfect.toDF("source", "a", "b", "c"),
      Seq(col("a"), col("b"), col("c")), Seq("source")).collect()(0)
    assert(p.getAs[Double]("p_bar") === 1.0)
    assert(p.getAs[Double]("kappa") === 1.0)
    // hand replay: v per item = 3, 2, 1, 0 over 4 items
    val mixed = Seq((true, true, true), (true, true, false),
      (true, false, false), (false, false, false))
      .map { case (a, b, c) => ("g", a, b, c) }
    val m = Preference.fleissKappa(mixed.toDF("source", "a", "b", "c"),
      Seq(col("a"), col("b"), col("c")), Seq("source")).collect()(0)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sagree = Σ v(v−1)+(3−v)(2−v) over v = 3,2,1,0 → 6+2+2+6 = 16
    val pBar = 16.0 / (4.0 * 6.0)
    val p1 = 6.0 / (4.0 * 3.0)
    val pE = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    assert(m.getAs[Double]("p_bar") === r6(pBar))
    assert(m.getAs[Double]("kappa") === r6((pBar - pE) / (1.0 - pE)))
    // unanimous pool: every vote positive → pE = 1 → NULL
    val una = Seq(("g", true, true, true), ("g", true, true, true))
    val u = Preference.fleissKappa(una.toDF("source", "a", "b", "c"),
      Seq(col("a"), col("b"), col("c")), Seq("source")).collect()(0)
    assert(u.isNullAt(u.fieldIndex("kappa")))
  }

  test("splitLeakage: hand-planted duplicate groups — the content-hash " +
    "row reads exactly zero leaked pairs, the pair arithmetic is exact") {
    import graft.datapipe.Sampling
    // group A: 3 exact copies; group B: 2 copies; 5 singletons
    val docs = (Seq.fill(3)("dup group a text") ++
      Seq.fill(2)("dup group b text") ++
      (1 to 5).map(i => s"unique text number $i")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = Sampling.splitLeakage(docs.toDF("id", "text"), "id", "text",
      trainPct = 50).collect().map(r => r.getString(0) -> r).toMap
    for ((_, r) <- out) {
      assert(r.getAs[Long]("n_docs") === 10L)
      assert(r.getAs[Long]("n_dup_pairs") === 4L, "C(3,2) + C(2,2)")
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_eval") === 10L)
    }
    assert(out("content_hash").getAs[Long]("n_leak_pairs") === 0L,
      "fingerprint-keyed assignment co-assigns every duplicate group")
    assert(out("content_hash").getAs[Double]("leak_frac") === 0.0)
    val leak = out("id_hash").getAs[Long]("n_leak_pairs")
    assert(leak >= 0L && leak <= 4L)
  }

  test("epochSchedule: a driver replay of the decay law on a hand " +
    "corpus — under-budget sources read eff_frac 1, deep repetition " +
    "discounts") {
    import graft.datapipe.Sampling
    val docs = (Seq.fill(10)(("small", 1L)) ++ Seq.fill(200)(("big", 1L)))
      .toDF("source", "tk")
    val out = Sampling.epochSchedule(docs, "source", col("tk"),
      budgetTokens = 100L).collect().map(r => r.getString(0) -> r).toMap
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val big = out("big") // u=200, share=50: under one epoch
    assert(big.getAs[Long]("share_tokens") === 50L)
    assert(big.getAs[Double]("epochs") === 0.25)
    assert(big.getAs[Double]("repeats") === 0.0)
    assert(big.getAs[Double]("eff_tokens") === 50.0)
    assert(big.getAs[Double]("eff_frac") === 1.0,
      "no repetition, every budgeted token is fresh")
    val small = out("small") // u=10, share=50: 5 epochs, R=4
    assert(small.getAs[Double]("epochs") === 5.0)
    val decay = r(math.exp(-(4.0 / 15.39)), 6)
    val eff = 10.0 + 10.0 * 15.39 * (1.0 - decay)
    assert(small.getAs[Double]("eff_tokens") === r(eff, 2))
    assert(small.getAs[Double]("eff_frac") === r(eff / 50.0, 6))
    assert(small.getAs[Double]("eff_frac") < 1.0,
      "repetition is discounted")
    // budget below the source count → share 0 → eff_frac NULL
    // (the degenerate convention), never 0/0 = NaN
    val tiny = Sampling.epochSchedule(docs, "source", col("tk"),
      budgetTokens = 1L).collect()(0)
    assert(tiny.getAs[Long]("share_tokens") === 0L)
    assert(tiny.isNullAt(tiny.fieldIndex("eff_frac")))
  }

  test("prefixCacheSavings: hand corpus — exact savings arithmetic per " +
    "width, and a width with no eligible documents reads its zero row") {
    import graft.datapipe.Packing
    val docs = Seq(
      "sys prompt alpha beta", // shares 2-prefix with the next
      "sys prompt gamma",
      "sys other one",         // shares only the 1-prefix
      "lone text here").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = Packing.prefixCacheSavings(docs, "text", Seq(2, 99))
      .collect().map(r => r.getLong(0) -> r).toMap
    val k2 = out(2L)
    assert(k2.getAs[Long]("n_docs") === 4L)
    assert(k2.getAs[Long]("n_groups") === 3L,
      "sys-prompt pair + sys-other + lone-text")
    assert(k2.getAs[Long]("shared_docs") === 2L)
    assert(k2.getAs[Long]("saved_tokens") === 2L, "(2-1) docs * k=2")
    assert(k2.getAs[Long]("total_tokens") === 4L + 3L + 3L + 3L)
    val k99 = out(99L)
    assert(k99.getAs[Long]("n_docs") === 0L && k99.getAs[Long]("n_groups") === 0L)
    assert(k99.isNullAt(k99.fieldIndex("saved_frac")),
      "no eligible documents, no defined fraction")
  }

  test("majorityVote: strict majority with the tie-to-false rule, and " +
    "per-rater accuracy replayed by hand") {
    // 3 raters over 4 items: majorities T, T, F, F;
    // rater a agrees 4/4, b 2/4, c 2/4
    val rows = Seq(
      (true, true, false),   // maj T: a+, b+, c-
      (true, false, true),   // maj T: a+, b-, c+
      (false, false, true),  // maj F: a+, b+, c-
      (false, true, false))  // maj F: a+, b-, c+
      .map { case (a, b, c) => ("g", a, b, c) }
    val out = Preference.majorityVote(rows.toDF("source", "a", "b", "c"),
      Seq("ra" -> col("a"), "rb" -> col("b"), "rc" -> col("c")),
      Seq("source")).collect().map(r => r.getAs[String]("rater") -> r).toMap
    assert(out.keySet === Set("ra", "rb", "rc"))
    assert(out("ra").getAs[Long]("n_items") === 4L)
    assert(out("ra").getAs[Long]("n_majority_true") === 2L)
    assert(out("ra").getAs[Long]("n_agree") === 4L)
    assert(out("ra").getAs[Double]("accuracy") === 1.0)
    assert(out("rb").getAs[Long]("n_agree") === 2L)
    assert(out("rc").getAs[Double]("accuracy") === 0.5)
    // two raters, one T one F → 2v = m, strict majority FALSE
    val tie = Preference.majorityVote(
      Seq(("g", true, false)).toDF("source", "a", "b"),
      Seq("ra" -> col("a"), "rb" -> col("b")), Seq("source"))
      .collect().map(r => r.getAs[String]("rater") -> r).toMap
    assert(tie("ra").getAs[Long]("n_majority_true") === 0L,
      "an exact tie reads consensus false")
    assert(tie("rb").getAs[Long]("n_agree") === 1L,
      "the false-voting rater agrees with the tie-broken consensus")
  }
}
