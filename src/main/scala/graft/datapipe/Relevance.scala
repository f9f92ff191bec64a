package graft.datapipe

import graft.datapipe.Staging.Staged

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level relevance scoring (BM25) — the ranking half of a
  * training-data pipeline's quality/retrieval tooling: score every
  * document against a fixed query-term set for retrieval-based data
  * selection ("keep documents relevant to these seed topics").
  *
  * BM25 (Robertson/Spärck Jones, the Lucene `k1`/`b` variant):
  *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))
  *
  * Scale shape: one token-explode pass filtered to the query terms
  * (map-side — the non-matching token stream never shuffles), one
  * groupBy (doc, term) for tf, and two tiny broadcast sides: per-term
  * document frequencies (|terms| rows) and the global (N, avgdl)
  * pair. The 100 TB corpus is shuffled only as (doc_id, term, tf)
  * rows for matching terms.
  *
  * Engine portability: every aggregate feeding the formula is exact
  * (counts, and avgdl = Σdl/N — one IEEE division of exact longs), so
  * the float pipeline is a fixed expression tree over identical
  * inputs in any engine. Per-term weights are combined as pivoted
  * columns added in literal term order — NOT a float `sum()` whose
  * partial-aggregation order Spark does not define — so the total is
  * bit-reproducible; the oracle replays the same left-to-right sum.
  */
object Relevance {

  /** (doc_id, score) for every document (0.0 when no term matches),
    * rounded to 4 dp. `terms` must be distinct lowercase tokens; the
    * scoring order is the Seq order, which the oracle must mirror.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      s"terms must be non-empty and distinct: $terms")
    val toks = split(TextAnalysis.normalize(col(textCol)), " ")
    val base = docs.select(col(idCol).as("doc_id"), toks.as("w"))
    // dl must count ALL tokens (BM25's length normalization), so it
    // rides the explode row alongside each matched term.
    // persist(): matched feeds BOTH the weighting join and the df
    // aggregation below — without it Catalyst plans the scan + explode
    // + filter pipeline twice (DataFrame reuse is logical, not
    // physical). Post-aggregation it is skinny (≤ |terms| rows per
    // doc), so the cache is bounded; session-scoped like the other
    // dedup staging tables (Bench/tests clear caches between queries).
    val matched = base
      .select(col("doc_id"), size(col("w")).as("dl"), explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .stage()
    val dfs = matched.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(size(col("w"))).as("sum_dl"))
    val weighted = matched
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("wt",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    // Pivot to fixed columns, then add left-to-right in term order:
    // at most one `wt` row exists per (doc, term), so each max() is
    // exact and the sum order is literal, not shuffle-dependent.
    val aggs = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === lit(t), col("wt"))).as(s"w_$i")
    }
    val perTerm = weighted.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
    val total = terms.indices
      .map(i => coalesce(col(s"w_$i"), lit(0.0)))
      .reduce(_ + _)
    base.select(col("doc_id"))
      .join(perTerm, Seq("doc_id"), "left")
      .select(col("doc_id"), round(total, 4).as("score"))
  }

  /** Per-document TF-IDF keyword extraction: the top-k terms of every
    * document by tf·ln(N/df), the topic-tagging/selection signal next
    * to [[bm25]]'s fixed-query scoring. Unlike BM25 the full token
    * stream is the subject, so the tf table (doc, term, count) is the
    * one corpus-scale shuffle, with map-side partial counts; document
    * frequency is a window count over the term partitioning (no
    * second table, no join), and the final ranking windows per doc —
    * groups are per-doc vocabularies, so no corpus-wide partition
    * exists at any scale. Ranking compares the 4-dp ROUNDED score
    * (ties on term asc), making the cut deterministic and
    * engine-portable; idf is one exact-long division + ln. Word-camp
    * tokenization (zero-length tokens are not words).
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(TextAnalysis.normalize(col(textCol)), " "),
      w => length(w) > 0)
    val tf = docs.select(col(idCol).as("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf").cast("double") *
        log(col("n_docs").cast("double") / col("df").cast("double")), 4))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("score"))
  }

  /** Top-n ranked list of one quality signal: the global cut runs as
    * TakeOrderedAndProject (per-partition top-n, merged on the
    * driver), and only the n SURVIVORS see a window — so the
    * single-partition row_number is bounded by n, never the corpus.
    * NULL scores sort last; doc-id tie-break pins every rank.
    * Output: (idCol, r) with r in 1..n as bigint.
    */
  def topRanks(scored: DataFrame, idCol: String, scoreCol: String,
               ascending: Boolean, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord =
      if (ascending) Seq(col(scoreCol).asc_nulls_last, col(idCol).asc)
      else Seq(col(scoreCol).desc_nulls_last, col(idCol).asc)
    scored.orderBy(ord: _*).limit(n)
      .select(col(idCol),
        row_number().over(Window.orderBy(ord: _*)).cast("bigint").as("r"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of
    * top-n lists: rrf(d) = Σ_lists 1/(k + r_list(d)), contributions
    * from lists that did not retrieve d are 0. The curation ensemble
    * an ingest pipeline runs over its quality signals — rank-space
    * fusion needs no score calibration across signals.
    *
    * Scale shape: every input is already a bounded n-row list, so the
    * union, the rank pivot, and the fusion arithmetic all run over at
    * most |lists|·n rows. Portability: ranks are exact integers and
    * the fusion sum is a FIXED-ORDER chain of |lists| double terms
    * (written identically in the oracle), rounded to 6 dp.
    *
    * Output: (idCol, r_<name>… nullable bigint, rrf).
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              k: Int): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    val tagged = lists.map { case (nm, df) =>
      df.select(col(idCol), lit(nm).as("sig"), col("r"))
    }.reduce(_ unionByName _)
    val rankCols = lists.map { case (nm, _) =>
      min(when(col("sig") === nm, col("r"))).as(s"r_$nm")
    }
    val pivoted = tagged.groupBy(col(idCol))
      .agg(rankCols.head, rankCols.tail: _*)
    val rrf = lists.map { case (nm, _) =>
      coalesce(lit(1.0) / (lit(k.toDouble) + col(s"r_$nm").cast("double")),
        lit(0.0))
    }.reduce(_ + _)
    pivoted.withColumn("rrf", round(rrf, 6))
  }
}
