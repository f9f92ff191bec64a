package graft

import org.apache.spark.sql.functions._

import graft.datapipe.{Relevance, Similarity, Staging}

/** Edge semantics of the round-12 retrieval wave: per-query BM25
  * ([[Relevance.bm25PerQuery]]), per-query RRF fusion
  * ([[Relevance.rrfFuseQueries]]), metadata-filtered vector search
  * ([[Similarity.filteredTopK]]). The value-level certification is
  * the DuckDB oracle; these tests pin the contracts the oracle's
  * fixed query shapes cannot reach.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta gamma"),
    (1L, "alpha alpha delta"),
    (2L, "epsilon zeta eta"),
    (3L, "beta beta beta theta")
  ).toDF("doc_id", "text")

  test("bm25PerQuery: duplicate terms in one query count once") {
    val qDup = Seq((0L, Seq("alpha", "alpha", "beta")))
      .toDF("q_id", "q_terms")
    val qOnce = Seq((0L, Seq("alpha", "beta"))).toDF("q_id", "q_terms")
    val a = Relevance.bm25PerQuery(corpus, "doc_id", "text", qDup, 10)
      .collect().map(_.toSeq).toSet
    Staging.releaseAll()
    val b = Relevance.bm25PerQuery(corpus, "doc_id", "text", qOnce, 10)
      .collect().map(_.toSeq).toSet
    Staging.releaseAll()
    assert(a === b, "a repeated query term must not double its weight")
  }

  test("bm25PerQuery: only matching documents are retrieved; a query " +
    "matching nothing yields zero rows") {
    val q = Seq((0L, Seq("alpha")), (1L, Seq("nosuchterm")))
      .toDF("q_id", "q_terms")
    val out = Relevance.bm25PerQuery(corpus, "doc_id", "text", q, 10)
      .collect()
    Staging.releaseAll()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ(0L).map(_.getAs[Long]("doc_id")).toSet === Set(0L, 1L),
      "only the docs containing 'alpha' may be retrieved")
    assert(!byQ.contains(1L), "no candidates -> no rows, not zero scores")
  }

  test("bm25PerQuery: ranks are contiguous best-first with doc_id " +
    "tie-break on the rounded score") {
    val q = Seq((7L, Seq("beta"))).toDF("q_id", "q_terms")
    val out = Relevance.bm25PerQuery(corpus, "doc_id", "text", q, 10)
      .orderBy(col("rnk")).collect()
    Staging.releaseAll()
    assert(out.map(_.getAs[Long]("rnk")).toSeq === (1L to out.length))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)), "best-first")
    // doc 3 has tf=3 of 'beta' vs doc 0's tf=1 -> doc 3 ranks first
    assert(out.head.getAs[Long]("doc_id") === 3L)
  }

  test("rrfFuseQueries: a one-list-only candidate gets the coalesced-0 " +
    "contribution from the missing list, and its absent rank is NULL") {
    val dense = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("q_id", "doc_id", "rnk")
    val lex = Seq((0L, 10L, 1L)).toDF("q_id", "doc_id", "rnk")
    val out = Relevance.rrfFuseQueries(Seq("dense" -> dense, "lex" -> lex),
      10, 60).orderBy(col("rnk")).collect()
    assert(out.length === 2)
    val both = out.find(_.getAs[Long]("doc_id") == 10L).get
    val one = out.find(_.getAs[Long]("doc_id") == 11L).get
    assert(both.getAs[Long]("rnk") === 1L, "two-list doc outranks one-list doc")
    assert(one.isNullAt(one.fieldIndex("r_lex")), "absent rank stays NULL")
    assert(math.abs(one.getAs[Double]("rrf") - 1.0 / 62.0) < 5e-7,
      "one-sided rrf = 1/(k + r_dense) alone")
  }

  test("mmrRerank: a near-duplicate of the first pick is demoted below " +
    "a diverse lower-relevance candidate; pure relevance would keep it") {
    // query at (1,0); c1 most relevant, c2 ≈ c1 (near-dup,
    // sim(c1,c2) ≈ 0.999, slightly less relevant), c3 on the OTHER
    // side of the query (sim(c1,c3) ≈ 0.24, relevance 0.75)
    val emb = Seq(
      (100L, Seq(1.0, 0.0)),
      (1L, Seq(0.82, 0.57)),
      (2L, Seq(0.80, 0.60)),
      (3L, Seq(0.75, -0.661437))
    ).toDF("vec_id", "emb")
    val q = emb.filter(col("vec_id") === 100)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val rel = Similarity.bruteForceTopK(emb, q, 3)
      .orderBy(col("rnk")).collect().map(_.getAs[Long]("vec_id")).toSeq
    Staging.releaseAll()
    assert(rel === Seq(1L, 2L, 3L), "relevance alone ranks the near-dup 2nd")
    val mmr = Similarity.mmrRerank(emb, q, nCand = 3, kFinal = 3, lambda = 0.7)
      .orderBy(col("rnk")).collect()
    Staging.releaseAll()
    assert(mmr.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 3L, 2L),
      "MMR must demote the near-duplicate below the diverse candidate")
    assert(mmr.map(_.getAs[Long]("rnk")).toSeq === Seq(1L, 2L, 3L))
  }

  test("mmrRerank: a query with fewer candidates than kFinal emits what " +
    "it has; invalid parameters fail loudly") {
    val emb = Seq(
      (50L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0))
    ).toDF("vec_id", "emb")
    val q = emb.filter(col("vec_id") === 50)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val out = Similarity.mmrRerank(emb, q, nCand = 10, kFinal = 5, lambda = 0.7)
      .collect()
    Staging.releaseAll()
    assert(out.length === 2, "2 candidates -> 2 picks, not 5")
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(emb, q, nCand = 2, kFinal = 5, lambda = 0.7)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(emb, q, nCand = 5, kFinal = 2, lambda = 1.5)
    }
  }

  test("silhouette: tight separated clusters score near 1, a midpoint " +
    "scores near 0, and cells < 2 fails loudly") {
    // two tight clusters around (10,0) and (0,10), plus one point at
    // the midpoint (5,5) — equidistant from both centroids
    val emb = (
      (0 until 4).map(i => (i.toLong, Seq(10.0 + i * 0.001, 0.0))) ++
      (0 until 4).map(i => (100L + i, Seq(0.0, 10.0 + i * 0.001))) :+
      (999L, Seq(5.0, 5.0))
    ).toDF("vec_id", "emb")
    val out = Similarity.silhouette(emb, cells = 2, iters = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val clusterA = (0 until 4).map(i => out(i.toLong))
    val clusterB = (0 until 4).map(i => out(100L + i))
    assert(clusterA.map(_._1).distinct.size === 1 &&
      clusterB.map(_._1).distinct.size === 1 &&
      clusterA.head._1 != clusterB.head._1,
      "the two planted clusters must land in different cells")
    assert((clusterA ++ clusterB).forall(_._2 > 0.9),
      s"tight separated clusters must score near 1: $out")
    // the midpoint JOINS one cluster and pulls that centroid toward
    // itself (a ≈ 32, b = 50 → s ≈ 0.36): well-separated members
    // must outscore it decisively
    assert(out(999L)._2 < 0.5,
      s"the boundary point must score far below the tight members: ${out(999L)}")
    intercept[IllegalArgumentException] {
      Similarity.silhouette(emb, cells = 1, iters = 2)
    }
  }

  test("filteredTopK: every result id is allowed, and results equal " +
    "bruteForceTopK over the pre-filtered corpus") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.8, 0.2)), (4L, Seq(0.1, 0.9))
    ).toDF("vec_id", "emb")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val allowed = Seq(1L, 2L).toDF("vec_id")
    val got = Similarity.filteredTopK(emb, allowed, q, 5).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSet.subsetOf(Set(1L, 2L)),
      "no excluded vector may surface")
    val ref = Similarity.bruteForceTopK(
      emb.join(allowed, Seq("vec_id"), "left_semi"), q, 5).collect()
    assert(got.map(_.toSeq).toSet === ref.map(_.toSeq).toSet)
  }
}
