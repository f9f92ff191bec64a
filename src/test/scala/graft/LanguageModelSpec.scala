package graft

import org.apache.spark.sql.functions._

import graft.datapipe.LanguageModel

/** Hand-computed oracles for the corpus-statistics quality scorers:
  * the bigram-LM perplexity and the DSIR importance weights.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def r8(x: Double) = BigDecimal(x)
    .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double) = BigDecimal(x)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  /** The engine's exact-decimal accumulation: each 8-dp-rounded
    * double becomes its DECIMAL(28,8) value, summed exactly.
    */
  private def decSum(xs: Seq[Double]): Double =
    xs.map(BigDecimal(_).setScale(8, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  test("perplexity matches the hand-trained add-one bigram model") {
    // corpus: "a b a b" + "a b"  →  c2(a,b)=3, c2(b,a)=1,
    // c1(a)=3, c1(b)=1, V=2
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lpAB = r8(math.log(4.0 / 5.0)) // (3+1)/(3+2)
    val lpBA = r8(math.log(2.0 / 3.0)) // (1+1)/(1+2)
    // doc 1 bigrams: (a,b),(b,a),(a,b)
    val ppl1 = r4(math.exp(-decSum(Seq(lpAB, lpBA, lpAB)) / 3.0))
    val ppl2 = r4(math.exp(-decSum(Seq(lpAB)) / 1.0))
    assert(out(1L) === ((3L, ppl1)))
    assert(out(2L) === ((1L, ppl2)))
  }

  test("perplexity: sub-bigram documents get n_bigrams=0 and null ppl") {
    val docs = Seq((1L, "solo"), (2L, "x y")).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(docs, "doc_id", "text")
    val solo = out.filter(col("doc_id") === 1).collect().head
    assert(solo.getLong(1) === 0L && solo.isNullAt(2))
    assert(out.count() === 2)
  }

  test("a common phrase scores lower perplexity than a rare one") {
    val common = (1L to 9L).map(i => (i, "the quick fox"))
    val docs = (common :+ (10L -> "zebra quantum xylophone"))
      .toDF("doc_id", "text")
    val ppl = LanguageModel.perplexity(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) < ppl(10L),
      s"common ${ppl(1L)} must beat rare ${ppl(10L)}")
  }

  test("trigram stupid backoff hits all three branches with hand values") {
    // train "a b c a b c": c3(abc)=2, c3(bca)=1, c3(cab)=1;
    // cb(ab)=2, cb(bc)=2, cb(ca)=1; cu(a)=cu(b)=cu(c)=2, N=6, V=3
    val train = Seq((10L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"),  // trigram seen: S = 2/2 = 1   → ppl 1.0
      (2L, "a a b"),  // aab unseen, (a,b) seen: S = 0.4·2/2 = 0.4 → ppl 2.5
      (3L, "b c b"),  // bcb unseen, (c,b) unseen: S = 0.16·(2+1)/9 → ppl 18.75
      (4L, "a b"))    // too short: n 0, ppl NULL
      .toDF("doc_id", "text")
    val got = LanguageModel.perplexityBackoff(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) === ((1L, Some(1.0))))
    assert(got(2L) === ((1L, Some(2.5))))
    assert(got(3L)._1 === 1L)
    assert(math.abs(got(3L)._2.get - 18.75) < 1e-3, s"unigram floor: ${got(3L)}")
    assert(got(4L) === ((0L, None)))
  }

  test("importance weights favor target-domain vocabulary and select top-N") {
    // target rows use 'alpha beta', raw-only rows use 'gamma delta':
    // alpha/beta buckets have high target mass → positive log ratio
    val docs = (
      (1L to 4L).map(i => (i, "alpha beta alpha", true)) ++
      (5L to 8L).map(i => (i, "gamma delta gamma", false)) :+
      ((9L, "alpha beta", false))).toDF("doc_id", "text", "tgt")
    val out = LanguageModel.importanceWeights(docs, "doc_id", "text",
      col("tgt"), buckets = 16, topN = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.length === 9)
    val byId = out.map(t => t._1 -> t).toMap
    // doc 9 shares the target vocabulary without being in the target
    // slice — DSIR must rank it with the target-like docs
    assert(byId(9L)._3 > byId(5L)._3,
      "target-vocab doc must outweigh raw-only doc")
    assert(out.count(_._4) === 5, "exactly topN selected")
    // the 5 selected are the 5 target-vocab docs (1..4 and 9)
    assert(out.filter(_._4).map(_._1).toSet === Set(1L, 2L, 3L, 4L, 9L))
  }

  test("importance weight replays as the exact decimal sum of bucket ratios") {
    val docs = Seq((1L, "u v w", true), (2L, "x y", false))
      .toDF("doc_id", "text", "tgt")
    val B = 8
    // replicate: bucket = md5-60(token) % B over the token stream
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % B
    }
    val stream = Seq(("u", true), ("v", true), ("w", true),
      ("x", false), ("y", false)).map { case (t, tg) => (bucket(t), tg) }
    val cr = stream.groupBy(_._1).view.mapValues(_.size).toMap
    val ct = stream.filter(_._2).groupBy(_._1).view.mapValues(_.size).toMap
    val (tr, tt) = (stream.size, stream.count(_._2))
    def lr(b: Long): Double = r8(
      math.log((ct.getOrElse(b, 0) + 1.0) / (tt + B)) -
        math.log((cr(b) + 1.0) / (tr + B)))
    val w1 = r4(decSum(Seq("u", "v", "w").map(t => lr(bucket(t)))))
    val out = LanguageModel.importanceWeights(docs, "doc_id", "text",
      col("tgt"), buckets = B, topN = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) === w1)
  }

  test("soft sampling adds the hash-derived Gumbel noise and selects top-N") {
    val docs = (
      (1L to 4L).map(i => (i, "alpha beta alpha", true)) ++
      (5L to 8L).map(i => (i, "gamma delta gamma", false)) :+
      ((9L, "alpha beta", false))).toDF("doc_id", "text", "tgt")
    val out = LanguageModel.importanceWeightsSoft(docs, "doc_id", "text",
      col("tgt"), buckets = 16, topN = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.length === 9)
    assert(out.count(_._4) === 3, "exactly topN selected")
    // the noise is the deterministic per-doc Gumbel: replay it
    def gumbel(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(15), 16)
      r8(-math.log(-math.log((h + 0.5) / math.pow(2, 60))))
    }
    for ((id, w, nw, _) <- out)
      assert(nw === r4(w + gumbel(id)), s"doc $id noisy weight")
    // selection follows the NOISY ranking, tie-broken by id
    val expect = out.sortBy(t => (-t._3, t._1)).take(3).map(_._1).toSet
    assert(out.filter(_._4).map(_._1).toSet === expect)
  }

  test("perplexity buckets tile each language by ppl with head=lowest") {
    // 7 'en' docs with monotone-distinct perplexities + 2 'de' docs;
    // 7 % 3 = 1 extra row → en tiles sized (3, 2, 2); de → (1, 1, 0)
    // so with 2 rows the de tail tier never fires.
    val docs = (
      (1L to 6L).map(i => (i, ("w " * i.toInt) + "rare" + i, "en")) ++
      Seq((7L, "w w", "en"), (8L, "x y x", "de"), (9L, "x z", "de")))
      .toDF("doc_id", "text", "lang")
    val out = LanguageModel.perplexityBuckets(docs, "doc_id", "text",
      "lang", buckets = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getString(4)))
    assert(out.length === 9)
    val en = out.filter(_._2 == "en")
    assert(en.groupBy(_._4).view.mapValues(_.size).toMap
      === Map(1L -> 3, 2L -> 2, 3L -> 2), "SQL-standard NTILE sizes")
    // the tile order follows (ppl asc, doc_id): every head ppl ≤
    // every middle ppl ≤ every tail ppl
    val byB = en.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    assert(byB(1L).max <= byB(2L).min && byB(2L).max <= byB(3L).min)
    assert(en.filter(_._4 == 1L).forall(_._5 == "head"))
    assert(en.filter(_._4 == 2L).forall(_._5 == "middle"))
    assert(en.filter(_._4 == 3L).forall(_._5 == "tail"))
    // a 2-row language occupies tiles 1 and 2, no tail
    assert(out.filter(_._2 == "de").map(_._5).sorted
      === Array("head", "middle"))
  }
}
