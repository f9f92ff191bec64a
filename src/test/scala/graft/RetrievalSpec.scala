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

  test("bm25PerQuery equals an independent in-memory reference on " +
    "random corpora (random doc/query shapes, dup terms, no-match terms)") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.scalacheck.Gen
    val vocab = (0 until 8).map(i => s"w$i")
    val genDoc = Gen.chooseNum(0, 14).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val genQuery = Gen.chooseNum(1, 4).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab :+ "zzz")))
    val rnd = new scala.util.Random(12)
    def sample[T](g: Gen[T]): T =
      Iterator.continually(g.sample).flatten.next()

    // the operator's spec, mirrored step for step: Spark's double
    // round (shortest-repr HALF_UP), the decimal(28,8) weight cast,
    // the exact decimal sum, and the 4-dp decimal round
    def ref(docs: Seq[(Long, String)], queries: Seq[(Long, Seq[String])],
            n: Int): Set[(Long, Long, Long, Double)] = {
      val k1 = 1.2; val b = 0.75
      if (docs.isEmpty) return Set.empty
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq }
      val nDocs = docs.size.toLong
      val sumDl = toks.map(_._2.size.toLong).sum
      val avgdl = sumDl.toDouble / nDocs.toDouble
      val qt = queries.flatMap { case (q, ts) => ts.map(q -> _) }.distinct
      val terms = qt.map(_._2).toSet
      val tfs: Seq[(Long, String, Long, Long)] = toks.flatMap {
        case (id, ws) =>
          val dl = ws.size.toLong
          ws.filter(terms).groupBy(w => w).toSeq
            .map { case (t, occ) => (id, t, dl, occ.size.toLong) }
      }
      val dfs: Map[String, Long] =
        tfs.groupBy(_._2).map { case (t, rs) => t -> rs.size.toLong }
      def wt8(tf: Long, dl: Long, df: Long): JBD = {
        val idf = math.log(1.0 + ((nDocs - df) + 0.5) / (df + 0.5))
        val w = idf * (tf * (k1 + 1.0)) /
          (tf + k1 * ((1 - b) + (b * dl) / avgdl))
        val rounded = JBD.valueOf(w).setScale(8, RoundingMode.HALF_UP)
          .doubleValue
        JBD.valueOf(rounded).setScale(8, RoundingMode.HALF_UP)
      }
      val byPair: Map[(Long, Long), JBD] = qt.flatMap { case (q, t) =>
        tfs.collect { case (id, tt, dl, tf) if tt == t =>
          ((q, id), wt8(tf, dl, dfs(t))) }
      }.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).reduce(_.add(_)) }
      byPair.toSeq
        .map { case ((q, id), s) =>
          (q, id, s.setScale(4, RoundingMode.HALF_UP).doubleValue) }
        .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          rows.sortBy(r => (-r._3, r._2)).take(n).zipWithIndex
            .map { case ((q, id, s), i) => (q, i + 1L, id, s) }
        }.toSet
    }

    for (_ <- 1 to 8) {
      val nDocs = rnd.nextInt(13)
      val docs = (0L until nDocs).map(i => (i, sample(genDoc)))
      val queries = (0L until (1 + rnd.nextInt(3)).toLong)
        .map(q => (q, sample(genQuery)))
      val got = Relevance.bm25PerQuery(
        docs.toDF("doc_id", "text"),
        "doc_id", "text", queries.toDF("q_id", "q_terms"), 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      Staging.releaseAll()
      val want = ref(docs, queries, 5)
      assert(got === want,
        s"mismatch on docs=$docs queries=$queries")
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

  test("mineTriplets: positives share the query label, negatives never " +
    "do, margin is pos minus neg, and a unique-label query emits no " +
    "triplets") {
    val emb = Seq(
      (0L, "a", Seq(1.0, 0.0)),   // query
      (1L, "a", Seq(0.95, 0.05)), // its positive (nearest same-label)
      (2L, "b", Seq(0.9, 0.1)),   // hard negative (nearer than 3)
      (3L, "b", Seq(0.0, 1.0)),   // easy negative
      (4L, "c", Seq(0.5, 0.5))    // unique label: query 4 mines nothing
    ).toDF("vec_id", "label", "emb")
    val q = emb.filter(col("vec_id").isin(0L, 4L))
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("emb").as("q_emb"))
    val out = Similarity.mineTriplets(emb, q, 10).collect()
    assert(out.forall(_.getAs[Long]("q_id") == 0L),
      "label 'c' has no other member — query 4 must mine no triplet")
    val rows = out.sortBy(_.getAs[Long]("rnk"))
    assert(rows.head.getAs[Long]("pos_id") === 1L,
      "the positive must be the nearest same-label neighbour")
    assert(rows.map(_.getAs[Long]("neg_id")).toSet === Set(2L, 3L, 4L),
      "every non-'a' vector is a candidate negative")
    assert(rows.map(_.getAs[Long]("neg_id")).headOption === Some(2L),
      "negatives rank nearest-first (the HARD ones lead)")
    for (r <- rows)
      assert(math.abs(r.getAs[Double]("margin") -
        BigDecimal(r.getAs[Double]("pos_score") - r.getAs[Double]("neg_score"))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        "margin must equal the 4-dp rounded pos/neg score gap")
  }

  test("containmentQrels: relevant iff the doc contains EVERY distinct " +
    "query term; a query's own doc always qualifies") {
    val q = Seq((0L, Seq("alpha", "beta")), (3L, Seq("beta", "beta")))
      .toDF("q_id", "q_terms")
    val out = Relevance.containmentQrels(corpus, "doc_id", "text", q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // q0 needs both alpha AND beta -> only doc 0; q3's duplicate term
    // collapses to {beta} -> docs 0 and 3
    assert(out === Set((0L, 0L), (3L, 0L), (3L, 3L)))
  }

  test("retrievalEval: metrics match a hand-computed case, a judged " +
    "query the ranker missed scores zero, and recall caps below 1 " +
    "when |rel| exceeds k") {
    // q0: rel {10,11,12}, retrieved (rank->doc) 1->10, 2->99 (miss),
    //     3->11 at k=2 -> ignored. hits=1, first=1.
    // q1: rel {20}, ranker retrieved nothing.
    // q2: rel {30,31,32}, k=2, retrieved both relevant -> recall 2/3.
    val retrieved = Seq(
      (0L, 1L, 10L), (0L, 2L, 99L), (0L, 3L, 11L),
      (2L, 1L, 31L), (2L, 2L, 30L)
    ).toDF("q_id", "rnk", "doc_id")
    val qrels = Seq(
      (0L, 10L), (0L, 11L), (0L, 12L),
      (1L, 20L),
      (2L, 30L), (2L, 31L), (2L, 32L)
    ).toDF("q_id", "doc_id")
    val out = Relevance.retrievalEval(retrieved, qrels, 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(0L, 1L, 2L),
      "every judged query emits a row, including the one with no rows")
    val q0 = out(0L)
    assert(q0.getAs[Long]("hits") === 1L)
    assert(q0.getAs[Long]("first_rank") === 1L)
    assert(q0.getAs[Double]("recall_k") === 0.333333)
    assert(q0.getAs[Double]("mrr") === 1.0)
    // dcg = g(1); idcg = g(1)+g(2) with g(r)=round(1/log2(r+1),8)
    val g1 = BigDecimal(1.0)
    val g2 = BigDecimal(1.0 / (math.log(3.0) / math.log(2.0)))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val nd0 = (BigDecimal(2) * g1 * 100000000 * 1000000 +
      (g1 + g2) * 100000000).toBigInt /
      (BigDecimal(2) * (g1 + g2) * 100000000).toBigInt
    assert(q0.getAs[Double]("ndcg_k") === nd0.toDouble / 1000000.0)
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_ret") === 0L)
    assert(q1.getAs[Double]("recall_k") === 0.0)
    assert(q1.getAs[Double]("mrr") === 0.0)
    assert(q1.getAs[Double]("ndcg_k") === 0.0)
    assert(q1.isNullAt(q1.fieldIndex("first_rank")),
      "no relevant retrieved -> first_rank is NULL, not 0")
    val q2 = out(2L)
    assert(q2.getAs[Double]("recall_k") === 0.666667)
    assert(q2.getAs[Double]("ndcg_k") === 1.0,
      "both slots relevant -> ideal ordering at k=2")
  }
}
