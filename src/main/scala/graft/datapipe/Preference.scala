package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-data analytics — the readouts a reward-model /
  * RLHF data pipeline runs OVER mined preference pairs (the
  * [[SftPrep.preferencePairs]] output or any (winner, loser) log):
  *
  *  - [[winRates]] — per-item win/loss tally with the Wilson score
  *    lower bound, the ranking statistic that does not reward items
  *    that won their only game over items that won 9 of 10;
  *  - [[btStrengths]] — Bradley–Terry strength fitting over a BOUNDED
  *    group dimension (sources, say) by minorization–maximization
  *    (Hunter 2004, "MM algorithms for generalized Bradley-Terry
  *    models"), the aggregate-level view of which corpus slices win
  *    head-to-head comparisons.
  *
  * Both are deterministic: the Wilson bound is one fixed IEEE
  * expression tree both engines evaluate identically (sqrt and the
  * four arithmetic ops are correctly rounded by IEEE 754 in the JVM
  * and in C++ alike), and the MM iterations run under the catalog's
  * 8-dp/decimal fold convention ([[Similarity]]'s powerChain note),
  * so an independent engine replays the fit bit-for-bit.
  */
object Preference {

  /** Loud cap on the collected Bradley–Terry comparison matrix:
    * cells are (winner group, loser group) pairs, so even a
    * thousand-way group dimension stays driver-trivial; corpora with
    * more groups than this should fit per-shard and are refused
    * rather than silently truncated.
    */
  val MaxBtCells: Int = 1 << 16

  /** Per-item win/loss record + Wilson lower bound, ONE tally
    * shuffle. Every pair contributes a win row for the chosen item
    * and a loss row for the rejected one; the union aggregates
    * map-side-combined on the item key — no window, no join,
    * corpus-shaped at any scale.
    *
    * `win_rate` is the exact HALF_UP 6-dp integer ratio
    * ([[graft.functions.ExactRound]]); `wilson_lb` is the 95%
    * (z = 1.96) Wilson score interval lower bound
    *
    *   (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)
    *
    * rounded to 6 dp — written as one fixed expression tree so the
    * oracle mirrors it operation-for-operation (every subexpression
    * is an IEEE correctly-rounded op, so the doubles agree exactly).
    *
    * Output: (item, wins, losses, n_games, win_rate, wilson_lb).
    */
  def winRates(pairs: DataFrame, chosenCol: String,
               rejectedCol: String): DataFrame = {
    val tallied = pairs.select(col(chosenCol).as("item"), lit(1L).as("win"))
      .unionAll(pairs.select(col(rejectedCol).as("item"), lit(0L).as("win")))
      .groupBy(col("item"))
      .agg(sum(col("win")).as("wins"), count(lit(1)).as("n_games"))
    val nD = col("n_games").cast("double")
    val p = col("wins").cast("double") / nD
    val z2 = lit(3.8416) // 1.96² exactly, in decimal
    tallied.select(
      col("item"),
      col("wins"),
      (col("n_games") - col("wins")).as("losses"),
      col("n_games"),
      graft.functions.ExactRound.ratio6(col("wins"), col("n_games"))
        .as("win_rate"),
      round((p + z2 / (lit(2.0) * nD)
          - lit(1.96) * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD))
        / (lit(1.0) + z2 / nD), 6).as("wilson_lb"))
  }

  /** Bradley–Terry strengths over a bounded group dimension by
    * `iters` MM steps. The ONLY distributed stage is the comparison-
    * matrix rollup — one (winner, loser)-keyed count shuffle whose
    * result is groups²-sized — after which the fit runs on collected
    * driver state (the bounded-model-state convention the k-means /
    * PCA family established: per-step Spark jobs would spend ~0.45 s
    * of scheduling each computing what a fold does in microseconds).
    * The collect is capped loudly at [[MaxBtCells]].
    *
    * One MM step, from strengths π (started uniform, round8(1/k)):
    *
    *   D_a = Σ_{b: n_ab>0, π_a+π_b>0} round8(n_ab / (π_a + π_b))
    *   u_a = round8(W_a / D_a)  (0 when D_a = 0)
    *   π'_a = round8(u_a / Σ u)
    *
    * with n_ab the GAME count (wins both ways), W_a total wins, every
    * Σ the 8-dp/decimal order-independent fold, every round8 the
    * shared HALF_UP image — each step an operation an independent
    * engine replays exactly (the oracle unrolls the steps as
    * materialized CTEs, the [[Similarity.pcaTop]] pattern). Same-group
    * pairs carry no cross-group signal and are dropped; groups that
    * never meet another group never enter the matrix and are absent
    * from the output (documented, not an error).
    *
    * Output: (group, wins, losses, n_games, pi, bt_rank), ranked by
    * strength descending with the group name as tie-break.
    */
  def btStrengths(pairs: DataFrame, winnerCol: String, loserCol: String,
                  iters: Int = 8): DataFrame = {
    require(iters >= 1, s"btStrengths needs >= 1 iterations; got $iters")
    val spark = pairs.sparkSession
    import spark.implicits._
    val cells = pairs
      .filter(col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).cast("string").as("a"),
        col(loserCol).cast("string").as("b"))
      .agg(count(lit(1)).as("w"))
      .limit(MaxBtCells + 1)
      .as[(String, String, Long)].collect()
    require(cells.length <= MaxBtCells,
      s"btStrengths matrix exceeds $MaxBtCells cells; shard the input")
    val groups = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val k = groups.length
    require(k >= 2, "btStrengths needs >= 2 groups with cross-group pairs")
    val idx = groups.zipWithIndex.toMap
    val w = Array.fill(k, k)(0L)
    for ((a, b, c) <- cells) w(idx(a))(idx(b)) = c
    val wins = Array.tabulate(k)(i => (0 until k).map(w(i)).sum)
    val losses = Array.tabulate(k)(j => (0 until k).map(i => w(i)(j)).sum)
    val games = Array.tabulate(k, k)((i, j) => w(i)(j) + w(j)(i))
    var pi = Array.fill(k)(round8(1.0 / k))
    for (_ <- 0 until iters) {
      val d = Array.tabulate(k)(i => fold8(
        (0 until k).iterator
          .filter(j => j != i && games(i)(j) > 0 && pi(i) + pi(j) > 0)
          .map(j => games(i)(j).toDouble / (pi(i) + pi(j))).toSeq))
      val u = Array.tabulate(k)(i =>
        if (d(i) > 0) round8(wins(i).toDouble / d(i)) else 0.0)
      val s = fold8(u.toSeq)
      pi = u.map(x => round8(x / s))
    }
    val ranked = (0 until k).sortBy(i => (-pi(i), groups(i)))
    ranked.zipWithIndex.map { case (i, r) =>
        (groups(i), wins(i), losses(i), wins(i) + losses(i), pi(i),
          (r + 1).toLong)
      }.toDF("group", "wins", "losses", "n_games", "pi", "bt_rank")
  }

  /** GRPO-style group-relative advantage (Shao et al. 2024,
    * DeepSeekMath §4.1): inside each group (all completions of one
    * prompt; here any caller-chosen stratum) standardize the integer
    * reward — advantage = (r − μ)/σ with the group's own mean and
    * population std — the normalization that makes rewards
    * comparable across prompts of different difficulty before a
    * policy gradient consumes them.
    *
    * Exactness: with integer rewards, (r − μ)/σ rewrites to
    * (n·r − Σr) / √(n·Σr² − (Σr)²) with the products formed in
    * DOUBLE, not long — n·Σr² wraps a long silently at ~9.2e18
    * (reached near 3e4-reward groups of 1e10 rows) while a double
    * product stays EXACT to 2^53 and degrades gracefully past it
    * (the [[Similarity.sourceCentroidDrift]] convention). The
    * expression is then one exact subtraction, one IEEE sqrt, one
    * IEEE division, one 6-dp round: both engines land on the
    * identical double. A zero-variance group reads NULL advantage
    * (no signal to standardize).
    *
    * Scale shape: one map-side-combined rollup to group stats + one
    * group-keyed join back (AQE broadcasts the stats side when the
    * group dimension is bounded; with per-prompt groups both sides
    * co-shuffle on the key) — never a window, never driver state.
    *
    * Output: (id, groupCols…, reward, n_group, advantage).
    */
  def groupAdvantage(df: DataFrame, idCol: String, reward: Column,
                     groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupAdvantage needs >= 1 group column")
    val grp = groupCols.map(col)
    val scored = df.select(
      col(idCol) +: reward.cast("bigint").as("reward") +: grp: _*)
    val stats = scored.groupBy(grp: _*).agg(
      count(lit(1)).as("n_group"),
      sum(col("reward")).as("s1"),
      sum(col("reward") * col("reward")).as("s2"))
    // products in double: exact to 2^53, no silent 2^63 wrap
    val varN = col("n_group").cast("double") * col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double")
    val numer = col("n_group").cast("double") * col("reward").cast("double") -
      col("s1").cast("double")
    scored.join(stats, groupCols)
      .select(col(idCol) +: grp ++: Seq(col("reward"), col("n_group"),
        when(varN > 0, round(numer / sqrt(varN), 6))
          .otherwise(lit(null).cast("double")).as("advantage")): _*)
  }

  /** Best-of-n rejection sampling (Nakano et al. 2021 WebGPT §3.2 /
    * Stiennon et al. 2020 §3 — the simplest inference-time RLHF
    * baseline and the data-side selector behind rejection-sampling
    * fine-tuning): inside each group (all completions of one prompt;
    * here any caller-chosen stratum) pick the completion with the
    * highest integer reward, deterministically (ties → smallest id),
    * and report the runner-up margin — the selection-confidence
    * readout (a margin-0 group's "best" is a coin flip the
    * deterministic tie-break merely freezes; downstream consumers
    * filter on it).
    *
    * Scale shape: two map-side-combined rollups (argmax via the
    * max-of-struct trick — (reward, −id) so equal rewards resolve to
    * the SMALLEST id — then the runner-up over best-row-excluded
    * rows) plus one group-keyed join between them; never a window,
    * never driver state. Singleton groups read NULL
    * second_reward/margin.
    *
    * Output: (groupCols…, n_candidates, best_id, best_reward,
    * second_reward, margin).
    */
  def bestOfN(df: DataFrame, idCol: String, reward: Column,
              groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "bestOfN needs >= 1 group column")
    val grp = groupCols.map(col)
    val scored = df.select(
      col(idCol).cast("long").as("cand_id") +:
        reward.cast("bigint").as("reward") +: grp: _*)
    val best = scored.groupBy(grp: _*).agg(
      max(struct(col("reward").as("r"), (-col("cand_id")).as("nid"))).as("b"),
      count(lit(1)).as("n_candidates"))
      .select(grp ++ Seq(col("n_candidates"),
        (-col("b.nid")).as("best_id"), col("b.r").as("best_reward")): _*)
    val second = scored.join(best, groupCols)
      .filter(col("cand_id") =!= col("best_id"))
      .groupBy(grp: _*)
      .agg(max(col("reward")).as("second_reward"))
    best.join(second, groupCols, "left")
      .select(grp ++ Seq(col("n_candidates"), col("best_id"),
        col("best_reward"), col("second_reward"),
        (col("best_reward") - col("second_reward")).as("margin")): _*)
  }

  /** T156: verbosity-bias diagnosis (Singhal et al. 2023, "A Long Way
    * to Go: Investigating Length Correlations in RLHF"): per group,
    * the Pearson correlation of reward with length plus the OLS
    * slope/intercept of reward on length — the readout that tells a
    * preference pipeline whether its reward signal is secretly a
    * length counter (corr near 1 means the policy will learn to be
    * verbose, not good) and how many reward points each extra length
    * unit buys (the slope a residualizer would subtract).
    *
    * Exactness: rewards and lengths are exact integers; the five
    * sums are one map-side-combined rollup, and every closed-form
    * readout forms its products in DOUBLE (exact to 2^53, the
    * [[groupAdvantage]] convention — n·Σrl wraps a long silently),
    * evaluates one fixed IEEE expression tree, and rounds to 6 dp.
    * Intercept comes from the closed form (Σr·Σl² − Σl·Σrl)/det —
    * never "mean − slope·mean" on intermediate roundings. Zero
    * length-variance groups read NULL slope/intercept/corr; zero
    * reward-variance groups read corr NULL, slope 0.
    *
    * Scale shape: ONE rollup straight to the group dimension;
    * nothing after it exceeds (group, 6 sums) rows.
    *
    * Output: (groupCols…, n_pairs, corr, slope, intercept).
    */
  def lengthBias(df: DataFrame, reward: Column, len: Column,
                 groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "lengthBias needs >= 1 group column")
    val grp = groupCols.map(col)
    val scored = df.select(
      reward.cast("bigint").as("r") +: len.cast("bigint").as("l") +: grp: _*)
    val agg = scored.groupBy(grp: _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("r")).as("sr"), sum(col("l")).as("sl"),
      sum(col("r") * col("l")).as("srl"),
      sum(col("r") * col("r")).as("srr"),
      sum(col("l") * col("l")).as("sll"))
    def d(c: String): Column = col(c).cast("double")
    val n = d("n_pairs")
    val cov = n * d("srl") - d("sr") * d("sl")
    val varR = n * d("srr") - d("sr") * d("sr")
    val varL = n * d("sll") - d("sl") * d("sl")
    agg.select(grp ++ Seq(
      col("n_pairs"),
      when(varR > 0 && varL > 0, round(cov / sqrt(varR * varL), 6))
        .otherwise(lit(null).cast("double")).as("corr"),
      when(varL > 0, round(cov / varL, 6))
        .otherwise(lit(null).cast("double")).as("slope"),
      when(varL > 0, round((d("sr") * d("sll") - d("sl") * d("srl"))
          / varL, 6))
        .otherwise(lit(null).cast("double")).as("intercept")): _*)
  }

  /** T157: Cohen's kappa (Cohen 1960) between two raters per group —
    * chance-corrected agreement, the QA statistic annotation
    * pipelines gate label batches on (two raters who agree 80% of
    * the time on a 90/10 label split are AT chance; raw percent
    * agreement hides that). Here the raters are any two boolean
    * verdict columns — human annotators, two quality classifiers, a
    * model-vs-heuristic pair.
    *
    * With n items, `agree` exact matches, and marginals a₁ = Σ A,
    * b₁ = Σ B:   pₒ = agree/n,   pₑ = (a₁b₁ + a₀b₀)/n²,
    *   κ = (n·agree − a₁b₁ − a₀b₀) / (n² − a₁b₁ − a₀b₀)
    * — the all-integer-counts form, products in DOUBLE (exact to
    * 2^53, the [[groupAdvantage]] convention), one IEEE division,
    * 6-dp round. When both raters are constant (pₑ = 1, denominator
    * 0) κ reads NULL — agreement carries no information. pₒ is the
    * exact HALF_UP ratio ([[graft.functions.ExactRound]]); pₑ rounds
    * its double to 6 dp.
    *
    * Scale shape: ONE map-side-combined rollup of four counters to
    * the group dimension; no joins, no windows.
    *
    * Output: (groupCols…, n_items, n_agree, po, pe, kappa).
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column,
                 groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "cohenKappa needs >= 1 group column")
    val grp = groupCols.map(col)
    val scored = df.select(
      raterA.cast("boolean").as("a") +: raterB.cast("boolean").as("b")
        +: grp: _*)
    val agg = scored.groupBy(grp: _*).agg(
      count(lit(1)).as("n_items"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
      sum(when(col("a"), 1L).otherwise(0L)).as("a1"),
      sum(when(col("b"), 1L).otherwise(0L)).as("b1"))
    def d(c: String): Column = col(c).cast("double")
    val n = d("n_items")
    val peNum = d("a1") * d("b1") +
      (n - d("a1")) * (n - d("b1"))
    val den = n * n - peNum
    agg.select(grp ++ Seq(
      col("n_items"), col("n_agree"),
      graft.functions.ExactRound.ratio6(col("n_agree"), col("n_items"))
        .as("po"),
      round(peNum / (n * n), 6).as("pe"),
      when(den > 0, round((n * d("n_agree") - peNum) / den, 6))
        .otherwise(lit(null).cast("double")).as("kappa")): _*)
  }

  /** T164: Fleiss' kappa (Fleiss 1971) — chance-corrected agreement
    * among m ≥ 2 raters per group, the multi-rater generalization of
    * [[cohenKappa]] (binary categories). With per-item positive-vote
    * count v of m raters, per-item agreement is
    * (v(v−1) + (m−v)(m−v−1)) / (m(m−1)); P̄ is its mean, and chance
    * agreement P̄ₑ = p₁² + p₀² from the pooled vote share. The
    * labeling-pipeline QA readout once more than two annotators (or
    * heuristic raters) vote per item.
    *
    * Exactness: v and the per-item agreement numerators are exact
    * integers folded in ONE map-side rollup (three counters); every
    * readout forms its products in DOUBLE (the [[groupAdvantage]]
    * convention), evaluates one fixed IEEE tree, and rounds to 6 dp.
    * A group whose pooled votes are unanimous (P̄ₑ = 1) reads NULL
    * kappa — agreement carries no information there.
    *
    * Scale shape: per-row integer arithmetic + one rollup to the
    * group dimension; no joins, no windows.
    *
    * Output: (groupCols…, n_items, m_raters, p_bar, p_e, kappa).
    */
  def fleissKappa(df: DataFrame, raters: Seq[Column],
                  groupCols: Seq[String]): DataFrame = {
    require(raters.size >= 2, "fleissKappa needs >= 2 raters")
    require(groupCols.nonEmpty, "fleissKappa needs >= 1 group column")
    val m = raters.size.toLong
    val grp = groupCols.map(col)
    val v = raters.map(r => when(r.cast("boolean"), 1L).otherwise(0L))
      .reduce(_ + _)
    val scored = df.select(v.as("v") +: grp: _*)
    val agg = scored.groupBy(grp: _*).agg(
      count(lit(1)).as("n_items"),
      sum(col("v")).as("sv"),
      sum(col("v") * (col("v") - 1) +
        (lit(m) - col("v")) * (lit(m) - col("v") - 1)).as("sagree"))
    def d(c: String): Column = col(c).cast("double")
    val n = d("n_items")
    val pBar = d("sagree") / (n * lit(m.toDouble * (m - 1)))
    val p1 = d("sv") / (n * lit(m.toDouble))
    val pE = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    agg.select(grp ++ Seq(
      col("n_items"), lit(m).as("m_raters"),
      round(pBar, 6).as("p_bar"),
      round(pE, 6).as("p_e"),
      when(lit(1.0) - pE > 0, round((pBar - pE) / (lit(1.0) - pE), 6))
        .otherwise(lit(null).cast("double")).as("kappa")): _*)
  }

  /** T167: majority-vote label aggregation with per-rater accuracy —
    * the one-step Dawid–Skene readout (Dawid & Skene 1979's full EM
    * iterates this; the first iteration is what most labeling
    * pipelines actually ship): per item, the consensus label is the
    * strict majority of m boolean raters (an exact tie reads
    * consensus FALSE — stated, deterministic), and each rater is
    * then scored by how often it agrees with the consensus — the
    * "which annotators can I trust" table that decides rater
    * weighting and requalification.
    *
    * Exactness: all integers — votes, the strict-majority
    * comparison 2v > m, the per-rater agreement counters (one
    * map-side rollup computes all m at once), and the exact integer
    * accuracy ratio.
    *
    * Scale shape: per-row integer arithmetic + ONE rollup to the
    * group dimension; the per-rater rows unfold from that bounded
    * frame via a m-way inline explode. No joins, no windows.
    *
    * Output: (groupCols…, rater, n_items, n_majority_true, n_agree,
    * accuracy) — one row per (group, rater).
    */
  def majorityVote(df: DataFrame, raters: Seq[(String, Column)],
                   groupCols: Seq[String]): DataFrame = {
    require(raters.size >= 2, "majorityVote needs >= 2 raters")
    require(raters.map(_._1).distinct.size == raters.size,
      s"duplicate rater names: ${raters.map(_._1)}")
    require(groupCols.nonEmpty, "majorityVote needs >= 1 group column")
    val m = raters.size.toLong
    val grp = groupCols.map(col)
    val voteCols = raters.map { case (nm, r) =>
      when(r.cast("boolean"), 1L).otherwise(0L).as(s"__v_$nm")
    }
    val v = raters.indices.map(i => col(s"__v_${raters(i)._1}"))
      .reduce(_ + _)
    val scored = df.select(voteCols ++: grp: _*)
      .withColumn("__maj", v * 2 > lit(m))
    val aggs = count(lit(1)).as("n_items") +:
      sum(when(col("__maj"), 1L).otherwise(0L)).as("n_majority_true") +:
      raters.map { case (nm, _) =>
        sum(when((col(s"__v_$nm") === 1L) === col("__maj"), 1L)
          .otherwise(0L)).as(s"__a_$nm")
      }
    val rolled = scored.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
    val perRater = explode(array(raters.map { case (nm, _) =>
      struct(lit(nm).as("rater"), col(s"__a_$nm").as("n_agree"))
    }: _*)).as("r")
    rolled.select(grp ++ Seq(col("n_items"), col("n_majority_true"),
        perRater): _*)
      .select(grp ++ Seq(col("r.rater").as("rater"), col("n_items"),
        col("n_majority_true"), col("r.n_agree").as("n_agree"),
        graft.functions.ExactRound.ratio6(col("r.n_agree"), col("n_items"))
          .as("accuracy")): _*)
  }

  /** T173: Krippendorff's alpha (Krippendorff 1970/2004), binary
    * data, m raters per item, no missing values — the
    * reliability coefficient annotation guidelines actually cite
    * (alpha ≥ 0.8 publishable, ≥ 0.667 tentative). Differs from
    * [[fleissKappa]] exactly in the small-sample correction: chance
    * disagreement is estimated from the N·(N−1) PAIRS of values
    * (N = n·m pooled votes), not the squared pooled share, so alpha
    * > the equivalent pi/kappa on small groups and converges to it
    * as N → ∞ — running both on the same rater panel (the catalog
    * does) is the standard cross-check that an agreement readout is
    * not a coefficient artifact.
    *
    * Closed form (nominal metric, binary): with per-item positive
    * votes v, S = Σ v(m−v), n₁ = Σ v, n₀ = N − n₁:
    * D_o = 2S/(N(m−1)), D_e = 2n₀n₁/(N(N−1)), and
    * alpha = 1 − ((N−1)·S)/((m−1)·n₀·n₁) — the ratio formed from
    * EXACT integers in one step (never from the rounded D_o/D_e
    * readouts), products in DOUBLE (the [[groupAdvantage]]
    * convention), one fixed IEEE tree, 6-dp round. A group with
    * unanimous pooled votes (n₀n₁ = 0) reads NULL alpha: D_e = 0,
    * reliability undefined.
    *
    * Scale shape: per-row integer arithmetic + ONE map-side-combined
    * two-counter rollup to the group dimension; no joins, no
    * windows.
    *
    * Output: (groupCols…, n_items, m_raters, d_o, d_e, alpha).
    */
  def krippendorffAlpha(df: DataFrame, raters: Seq[Column],
                        groupCols: Seq[String]): DataFrame = {
    require(raters.size >= 2, "krippendorffAlpha needs >= 2 raters")
    require(groupCols.nonEmpty, "krippendorffAlpha needs >= 1 group column")
    val m = raters.size.toLong
    val grp = groupCols.map(col)
    val v = raters.map(r => when(r.cast("boolean"), 1L).otherwise(0L))
      .reduce(_ + _)
    val scored = df.select(v.as("v") +: grp: _*)
    val agg = scored.groupBy(grp: _*).agg(
      count(lit(1)).as("n_items"),
      sum(col("v")).as("n1"),
      sum(col("v") * (lit(m) - col("v"))).as("s"))
    def d(c: String): Column = col(c).cast("double")
    val bigN = d("n_items") * lit(m.toDouble)
    val n0 = bigN - d("n1")
    val dO = lit(2.0) * d("s") / (bigN * lit((m - 1).toDouble))
    val dE = lit(2.0) * n0 * d("n1") / (bigN * (bigN - lit(1.0)))
    agg.select(grp ++ Seq(
      col("n_items"), lit(m).as("m_raters"),
      round(dO, 6).as("d_o"),
      round(dE, 6).as("d_e"),
      when(col("n1") > 0 && col("n1") < col("n_items") * lit(m),
        round(lit(1.0) - ((bigN - lit(1.0)) * d("s")) /
          (lit((m - 1).toDouble) * n0 * d("n1")), 6))
        .otherwise(lit(null).cast("double")).as("alpha")): _*)
  }

  /** The engines' shared portable fold (see [[Similarity]]): Σ
    * round8(x) accumulated as DECIMAL, returned as its double image.
    */
  private def fold8(xs: Iterable[Double]): Double =
    graft.functions.ExactRound.fold8(xs)

  /** Catalyst `round(double, 8)`'s exact image (both go through
    * `java.math.BigDecimal.valueOf` + HALF_UP).
    */
  private def round8(x: Double): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
}
