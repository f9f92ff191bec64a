package graft.datapipe

import graft.datapipe.Staging.Staged

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data preparation: the post-pretraining half
  * of a training-data pipeline. Two operators:
  *
  *  - [[renderConversations]] — turn a document into a deterministic
  *    multi-turn conversation, render it through a chat template, and
  *    account the loss mask (which tokens the SFT objective actually
  *    trains on — assistant turns only);
  *  - [[preferencePairs]] — mine (chosen, rejected) preference pairs
  *    for DPO/RLHF-style training by pairing quality extremes inside
  *    matched groups.
  *
  * Both are deterministic end-to-end (no randomness, no floats except
  * the exact-integer loss ratio), so an independent engine replays
  * them bit-for-bit — the md5 over the rendered template certifies
  * the BYTE-level template contract, the thing that silently breaks
  * real SFT runs when two renderers disagree on whitespace.
  */
object SftPrep {

  /** Deterministic conversation assembly + chat-template render +
    * loss-mask accounting, per document, ZERO shuffle.
    *
    * The document's normalized tokens are cut into consecutive turns
    * of `turnTokens` tokens (the last turn keeps the remainder),
    * alternating roles user, assistant, user, … — the deterministic
    * stand-in for real dialogue structure that lets every downstream
    * contract (template bytes, mask arithmetic) be certified exactly.
    * Each turn renders as
    * {{{<|role|> tok tok … <|eot|>}}}
    * and turns join with a single `\n`. The md5 of the full render is
    * the template contract; the loss mask is the assistant-turn token
    * count (`asst_tokens`), since SFT computes loss on assistant
    * spans only, and `loss_ratio = asst_tokens / n_tokens` is the
    * fraction of compute that trains (exact HALF_UP 6-dp integer
    * ratio, [[graft.functions.ExactRound]]).
    *
    * `user_tokens`/`asst_tokens` are CLOSED FORM — with n tokens and
    * width w, each full 2w-block gives w to each role and the tail
    * r = n mod 2w gives min(r, w) to the user — so the accounting
    * needs no explode at all; only the render walks the turns, via
    * `transform` over a `sequence` (per-row expression, no UDF, no
    * shuffle). Tokens follow the split-camp convention
    * ([[TextAnalysis.normalize]] note): an empty document is one
    * empty token and renders as a single user turn.
    *
    * Output: (id, n_tokens, n_turns, user_tokens, asst_tokens,
    * loss_ratio, render_len, render_md5).
    */
  def renderConversations(docs: DataFrame, idCol: String, textCol: String,
                          turnTokens: Int = 8): DataFrame = {
    require(turnTokens >= 1, s"turnTokens must be >= 1, got $turnTokens")
    val w = lit(turnTokens.toLong)
    val toks = split(TextAnalysis.normalize(col(textCol)), " ")
    val n = size(toks).cast("bigint")
    // subtract the remainder before dividing so the IEEE division is
    // exact (numerator a multiple of the divisor) and the cast back
    // to bigint is lossless — per-document token counts sit far
    // below the 2^53 double-exactness bound
    val nTurns = (((n + w - lit(1L)) - (n + w - lit(1L)) % w) / w)
      .cast("bigint")
    val fullBlocks = (((n - n % (w * 2)) / (w * 2))).cast("bigint")
    val userToks = fullBlocks * w + least(n % (w * 2), w)
    val render = array_join(
      transform(sequence(lit(0L), nTurns - lit(1L)), i =>
        concat(
          lit("<|"),
          when(i % 2 === 0, lit("user")).otherwise(lit("assistant")),
          lit("|> "),
          array_join(slice(toks, (i * w + lit(1L)).cast("int"),
            lit(turnTokens)), " "),
          lit(" <|eot|>"))),
      "\n")
    docs.select(
      col(idCol),
      n.as("n_tokens"),
      nTurns.as("n_turns"),
      userToks.as("user_tokens"),
      (n - userToks).as("asst_tokens"),
      graft.functions.ExactRound.ratio6(n - userToks, n).as("loss_ratio"),
      length(render).cast("bigint").as("render_len"),
      md5(render).as("render_md5"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): replace
    * token spans with numbered sentinels, emitting the (inputs,
    * targets) pair the denoising objective trains on —
    * {{{inputs:  <extra_id_0> unmasked … <extra_id_1> unmasked …
    * targets: <extra_id_0> masked …   <extra_id_1> masked …}}}
    * The original samples span starts at random; here the spans are
    * DETERMINISTIC — position p (1-based) is masked iff
    * (p−1) mod everyN < spanLen, i.e. a spanLen-token span opens
    * every everyN tokens — so the corruption rate is
    * spanLen/everyN (the T5 recipe: 3/20 = 15%, mean span 3) and
    * both renders are exactly replayable (the md5 pair is the
    * corruption contract; the seam for a seeded-hash span picker is
    * the masking rule alone — the render walk is unchanged).
    *
    * Accounting is CLOSED FORM (no explode): q = n div everyN full
    * periods mask q·spanLen tokens, the tail masks min(n mod everyN,
    * spanLen); n_spans = q + (1 if the tail is non-empty). The
    * renders build as flatten-of-slices per span — sentinel ++
    * unmasked remainder (inputs) / sentinel ++ masked span (targets)
    * — per-row expressions only, ZERO shuffle, streams unchanged.
    *
    * Output: (id, n_tokens, masked_tokens, n_spans, mask_ratio,
    * inputs_len, targets_len, inputs_md5, targets_md5).
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  spanLen: Int = 3, everyN: Int = 20): DataFrame = {
    require(spanLen >= 1 && everyN > spanLen,
      s"need 1 <= spanLen < everyN, got spanLen=$spanLen everyN=$everyN")
    val sl = lit(spanLen.toLong)
    val en = lit(everyN.toLong)
    val toks = split(TextAnalysis.normalize(col(textCol)), " ")
    val n = size(toks).cast("bigint")
    val r = n % en
    // exact: the numerator is a multiple of the divisor (scaladoc of
    // renderConversations explains the 2^53 headroom)
    val q = ((n - r) / en).cast("bigint")
    val masked = q * sl + least(r, sl)
    val nSpans = q + when(r > 0, lit(1L)).otherwise(lit(0L))
    def sentinel(k: Column): Column =
      concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    def render(slicer: Column => Column): Column =
      array_join(flatten(transform(
        sequence(lit(0L), nSpans - lit(1L)),
        k => concat(array(sentinel(k)), slicer(k)))), " ")
    val inputs = render(k => slice(toks,
      (k * en + sl + lit(1L)).cast("int"), lit(everyN - spanLen)))
    val targets = render(k => slice(toks,
      (k * en + lit(1L)).cast("int"), lit(spanLen)))
    docs.select(
      col(idCol),
      n.as("n_tokens"),
      masked.as("masked_tokens"),
      nSpans.as("n_spans"),
      graft.functions.ExactRound.ratio6(masked, n).as("mask_ratio"),
      length(inputs).cast("bigint").as("inputs_len"),
      length(targets).cast("bigint").as("targets_len"),
      md5(inputs).as("inputs_md5"),
      md5(targets).as("targets_md5"))
  }

  /** DPO-style preference-pair mining: inside each group (the
    * MATCHED stratum — same source, same length bucket, … — so the
    * preference signal is quality, not confounders), rank documents
    * by a caller-supplied integer quality score and pair rank i from
    * the top with rank i from the bottom. Pair i carries
    * `margin = score(chosen) − score(rejected)`; ties (margin 0)
    * are dropped — an equal-scored pair carries no preference signal
    * — and the middle element of an odd group never pairs.
    *
    * Determinism: the score must be an exact integer (the catalog
    * entry uses distinct-token count); ranking tie-breaks on id, so
    * the pairing is a pure function of the input.
    *
    * Scale shape: one window rank per group (groups are bounded
    * strata, so the partition-by window parallelizes across them —
    * no global ordering anywhere) + one (grp, rank)-keyed self-join
    * of the top half against the mirrored bottom half. The ranked
    * frame is staged so the two sides scan the corpus once.
    *
    * Output: (groupCols…, pair_rank, chosen_id, rejected_id,
    * chosen_score, rejected_score, margin).
    */
  def preferencePairs(docs: DataFrame, idCol: String, score: Column,
                      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "preferencePairs needs >= 1 group column")
    val grp = groupCols.map(col)
    val win = Window.partitionBy(grp: _*)
      .orderBy(col("__score").desc, col(idCol).asc)
    val ranked = docs
      .select(col(idCol) +: score.as("__score") +: grp: _*)
      .withColumn("rn", row_number().over(win).cast("bigint"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(grp: _*)).cast("bigint"))
      .stage()
    val top = ranked.filter(col("rn") * 2 < col("cnt") + 1)
      .select(grp :+ col("rn").as("pair_rank") :+
        col(idCol).as("chosen_id") :+ col("__score").as("chosen_score"): _*)
    val bot = ranked
      .select(grp :+ (col("cnt") + 1 - col("rn")).as("pair_rank") :+
        col(idCol).as("rejected_id") :+
        col("__score").as("rejected_score"): _*)
    top.join(bot, groupCols :+ "pair_rank")
      .filter(col("chosen_score") > col("rejected_score"))
      .select(grp ++ Seq(col("pair_rank"), col("chosen_id"),
        col("rejected_id"), col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin")): _*)
  }
}
