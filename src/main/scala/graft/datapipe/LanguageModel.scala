package graft.datapipe

import graft.datapipe.Staging.Staged

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics quality scoring — the model-based half of a
  * training-data filter stack (the rule-based half is
  * [[TextAnalysis.qualityScore]]/[[TextAnalysis.repetition]]):
  *
  *  - [[perplexity]]: a corpus-trained add-one bigram language model
  *    scores every document by perplexity — the CCNet recipe
  *    (Wenzek et al. 2020, arXiv:1911.00359) where LM perplexity
  *    against in-domain statistics ranks crawl text for keeping the
  *    head/middle of the distribution.
  *  - [[importanceWeights]]: DSIR-style importance weighting (Xie et
  *    al. 2023, arXiv:2302.03169) — hashed-unigram bag-of-words
  *    likelihood ratio between a target domain and the raw corpus,
  *    with a deterministic top-N selection.
  *
  * Engine-portability conventions shared with the rest of the
  * catalog: all model statistics are exact integer counts (portable
  * under any aggregation order); every per-token log term is rounded
  * to 8 dp and then summed as DECIMAL(28,8) — an EXACT sum,
  * order-independent by construction (the catalog's long-cents
  * convention applied to log space) — so any engine reproduces the
  * per-document score bit-identically without pinning a fold order;
  * final scores round to 4 dp.
  */
object LanguageModel {

  private def toks(textCol: Column): Column =
    split(TextAnalysis.normalize(textCol), " ")

  /** Per-document bigram-LM perplexity under an add-one-smoothed
    * bigram model trained on the WHOLE input corpus:
    *
    *   p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)
    *   ppl(doc) = exp(−Σ_i ln p(w_{i+1}|w_i) / n_bigrams)
    *
    * with c(w1,·) = Σ_w2 c(w1,w2) (bigram-context count) and V the
    * distinct-token vocabulary size. Documents with fewer than 2
    * tokens have no bigrams: n_bigrams = 0, ppl = NULL.
    *
    * Scale shape: training is ONE groupBy over the corpus's bigram
    * stream (partial aggregation map-side, shuffle carries (w1, w2,
    * count) — the count table, not the corpus); scoring joins each
    * document's bigram rows back to that table on (w1, w2). Both
    * sides shuffle on the bigram key, so scoring co-partitions with
    * the model — the standard "join the n-gram table" shape that
    * scales to any corpus since the model table is bounded by
    * distinct bigrams, not document count. The per-doc ln-sum runs as
    * an exact DECIMAL(28,8) aggregation of the 8-dp-rounded terms —
    * order-independent, so an ordinary partial-aggregated `sum()`
    * reproduces bit-identically in any engine.
    *
    * Output: (doc_id, n_bigrams, ppl) — ppl rounded to 4 dp.
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("w"))
    // (doc_id, w1, w2) bigram stream; persists because it feeds the
    // count training AND the scoring join (see Staging)
    val bigrams = base.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))))
      .select(col("doc_id"), col("col.w1"), col("col.w2"))
      .stage()
    val c2 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy(col("w1"))
      .agg(count(lit(1)).as("c1"))
    // V counts every distinct token (incl. document-final positions)
    val vocab = base.select(explode(col("w")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    val scored = bigrams
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      // round(…, 8): Math.log and a C library's log may disagree in
      // the last ulp on identical inputs; quantizing each term to
      // 8 dp makes the decimal sum engine-portable outright
      .withColumn("lp",
        round(log((col("c2") + lit(1)).cast("double") /
          (col("c1") + col("v")).cast("double")), 8))
      .groupBy(col("doc_id"))
      .agg(sum(col("lp").cast("decimal(28,8)")).as("slp"),
        count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(exp(-col("slp").cast("double") / col("n_bigrams")), 4)
          .as("ppl"))
    base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("ppl"))
  }

  /** DSIR-style importance weights: hashed-unigram log-likelihood
    * ratio of a target domain against the raw corpus, with a
    * deterministic top-N selection.
    *
    *   b(tok)  = md5_60(tok) mod `buckets`   (engine-portable hash)
    *   lr_b    = ln((ct_b + 1)/(Tt + B)) − ln((cr_b + 1)/(Tr + B))
    *   w(doc)  = Σ_i lr_{b(tok_i)}           (exact decimal sum)
    *
    * where ct/cr are per-bucket token counts over the target slice /
    * whole corpus and Tt/Tr their totals (add-one smoothing over B
    * buckets). `isTarget` marks the target-domain rows (e.g.
    * `col("lang") === "en"` for "resample toward English"). The raw
    * distribution deliberately includes the target rows — DSIR's
    * q(x) is the sampling corpus itself.
    *
    * `selected` marks the `topN` highest-weight documents (ties by
    * doc_id) — the deterministic hard-selection variant; DSIR's
    * Gumbel-noise soft sampling is this ranking with hash-derived
    * noise added to w, which callers can layer on before ranking.
    *
    * Scale shape: the model is 2×B counts (one groupBy over hashed
    * buckets — the corpus shuffles only (bucket, count) partials);
    * scoring is a broadcast join of the B-row ratio table onto the
    * token stream plus one ordered fold per document; the top-N cut
    * runs as orderBy+limit — Spark plans TakeOrderedAndProject
    * (per-partition top-N heaps, merged on the driver), never a
    * global single-partition window — and the selected ids join back
    * broadcast.
    *
    * Output: (doc_id, n_tokens, weight, selected), weight = 4 dp.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 64,
                        topN: Int = 100): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("w"),
      isTarget.as("is_target"))
    // (doc_id, bucket) token stream: feeds both count trainings and
    // the scoring sum (see Staging)
    val tokens = base
      .select(col("doc_id"), col("is_target"), explode(col("w")).as("t"))
      .select(col("doc_id"), col("is_target"),
        pmod(TextAnalysis.md5Long60(col("t").cast("binary")),
          lit(buckets.toLong)).as("b"))
      .stage()
    val raw = tokens.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = tokens.filter(col("is_target"))
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    // B-row model: bucket → log ratio (missing target buckets get the
    // smoothed zero-count mass)
    val totals = raw.agg(sum(col("cr")).as("tr")).crossJoin(
      tgt.agg(sum(col("ct")).as("tt")))
    // round(…, 8): same ulp-portability quantization as perplexity's lp
    val ratios = raw.join(tgt, Seq("b"), "left").crossJoin(totals)
      .select(col("b"),
        round(log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
          (col("tt") + lit(buckets)).cast("double")) -
          log((col("cr") + lit(1)).cast("double") /
            (col("tr") + lit(buckets)).cast("double")), 8).as("lr"))
    val weights = tokens
      .join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lr").cast("decimal(28,8)")).as("wsum"),
        count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("wsum").cast("double"), 4).as("weight"))
    // stage(): the skinny (doc_id, n_tokens, weight) table feeds both
    // the top-N cut and the final output join — unstaged, the whole
    // token-fold pipeline runs twice
    val all = base.select(col("doc_id"))
      .join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
      .stage()
    // orderBy+limit plans as TakeOrderedAndProject: per-partition
    // top-N heaps merged on the driver, bounded by N — never a
    // global one-partition ranking window
    val top = all.orderBy(col("weight").desc, col("doc_id")).limit(topN)
      .select(col("doc_id"), lit(true).as("sel"))
    all.join(broadcast(top), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("weight"),
        coalesce(col("sel"), lit(false)).as("selected"))
  }

  /** Train the [[importanceWeights]] bucket model and return it as a
    * dense B-length array (index = bucket, value = 8-dp log ratio) —
    * the offline half of train-offline/score-inline. Buckets absent
    * from the corpus get the smoothed zero-count ratio, so a stream
    * token hashing to an unseen bucket still scores. Driver traffic
    * is B doubles, independent of corpus size.
    */
  def bucketRatios(docs: DataFrame, idCol: String, textCol: String,
                   isTarget: Column, buckets: Int = 64): Array[Double] = {
    val tokens = docs
      .select(isTarget.as("is_target"), explode(toks(col(textCol))).as("t"))
      .select(col("is_target"),
        pmod(TextAnalysis.md5Long60(col("t").cast("binary")),
          lit(buckets.toLong)).as("b"))
    val counts = tokens.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      count(when(col("is_target"), 1)).as("ct"))
      .collect().map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val tr = counts.valuesIterator.map(_._1).sum
    val tt = counts.valuesIterator.map(_._2).sum
    Array.tabulate(buckets) { b =>
      val (cr, ct) = counts.getOrElse(b, (0L, 0L))
      val lr = math.log((ct + 1.0) / (tt + buckets)) -
        math.log((cr + 1.0) / (tr + buckets))
      BigDecimal(lr).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Score rows with a PRE-TRAINED [[bucketRatios]] model as one
    * stateless per-row expression: hash each token, index the literal
    * ratio array, fold in token order. No shuffle, no state — this is
    * the inline-filter shape a streaming ingest pipeline runs (train
    * offline on a corpus snapshot, score every arriving document),
    * and it streams through Structured Streaming untouched. On the
    * training corpus itself it reproduces [[importanceWeights]]'
    * weight column exactly (same rounded ratios, same ordered fold).
    */
  def importanceScore(docs: DataFrame, idCol: String, textCol: String,
                      ratios: Array[Double]): DataFrame = {
    val lrArr = array(ratios.map(lit): _*)
    val w = toks(col(textCol))
    // the same exact-decimal accumulation as the batch scorer, as a
    // per-row fold (each term is an 8-dp-rounded double, so the
    // decimal sum is exact and matches bit-identically)
    docs.select(col(idCol).as("doc_id"),
      size(w).cast("bigint").as("n_tokens"),
      round(aggregate(
        transform(w, t => element_at(lrArr,
          pmod(TextAnalysis.md5Long60(t.cast("binary")),
            lit(ratios.length.toLong)).cast("int") + 1)),
        lit(0).cast("decimal(28,8)"),
        (acc, x) => (acc + x.cast("decimal(28,8)")).cast("decimal(28,8)"),
        acc => acc.cast("double")), 4).as("weight"))
  }
}
