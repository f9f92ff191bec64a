package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Memorization-audit instrumentation: plant deterministic canary
  * strings into a training corpus ([[canaryInject]]), then scan the
  * corpus for every planted canary and report its exposure count
  * ([[canaryExposure]]) — the standard secret-sharer-style audit
  * loop (Carlini et al. 2019, "The Secret Sharer") a pipeline runs
  * to measure how often a unique marker survives dedup / mixing and
  * to detect cross-document leakage before training memorizes it.
  *
  * Everything is deterministic (canary text is the md5 of the origin
  * id), injection is a pure per-row function of (id, text) — ZERO
  * shuffle, stream-safe — and the scan is regex extraction + one
  * canary-keyed count shuffle + one registry join: linear in the
  * corpus at any scale, never a canaries × corpus product.
  */
object Audit {

  /** Matches exactly the tokens [[canaryToken]] emits. */
  val CanaryPattern = "canary_[0-9a-f]{32}"

  /** The canary planted for origin id `id`: `canary_` + md5 of the
    * id's decimal string — unique per origin, structurally absent
    * from natural text, and replayable by any engine with md5.
    */
  def canaryToken(id: Column): Column =
    concat(lit("canary_"), md5(id.cast("string")))

  /** Deterministic canary injection. Every document whose id is
    * ≡ 0 (mod everyK) gets its own canary appended; additionally the
    * document at id + leakOffset (when present) receives a COPY of
    * that canary — the planted leak that gives the downstream
    * exposure scan a non-trivial signal to find (a real audit's
    * "the same secret appears in two crawl shards" case). Both
    * appends are pure functions of the receiving row's own id, so
    * the whole operator is one per-row projection: a document knows
    * it hosts a leak iff its id − leakOffset is a canary origin.
    *
    * Output: the input columns with `textCol` replaced by the
    * injected text plus `is_origin` (hosts its own canary).
    */
  def canaryInject(docs: DataFrame, idCol: String, textCol: String,
                   everyK: Int = 97, leakOffset: Long = 417L): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    require(leakOffset != 0, "leakOffset 0 would double the origin canary")
    val id = col(idCol)
    val own = when(id % everyK === 0,
      concat(lit(" "), canaryToken(id))).otherwise(lit(""))
    val leak = when(id >= lit(leakOffset) &&
        (id - leakOffset) % everyK === 0,
      concat(lit(" "), canaryToken(id - leakOffset))).otherwise(lit(""))
    docs.withColumn(textCol, concat(col(textCol), own, leak))
      .withColumn("is_origin", id % everyK === 0)
  }

  /** Exposure scan over an (injected) corpus: extract every canary-
    * shaped token, count occurrences per canary, and join the counts
    * back onto the registry of planted canaries (re-derived from the
    * same id rule, so the audit needs no side state). A canary that
    * leaked is any with n_found > 1; one the pipeline LOST (dedup
    * dropped the host span, say) would read found_origin = false —
    * the two failure modes a memorization audit exists to catch.
    *
    * Scale shape: the extraction is per-row; hits aggregate on the
    * canary key (map-side combined — a document holds ≤ 2 canaries);
    * the registry join is canary-keyed and registry-sized (corpus /
    * everyK rows — NOT broadcast: at 100 TB the registry is itself
    * large). No stage touches canaries × corpus.
    *
    * Output: (origin_id, canary, n_found, found_origin, leaked).
    */
  def canaryExposure(injected: DataFrame, idCol: String, textCol: String,
                     everyK: Int = 97): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val hits = injected
      .select(explode(
        regexp_extract_all(col(textCol), lit(CanaryPattern), lit(0)))
        .as("canary"))
      .groupBy(col("canary"))
      .agg(count(lit(1)).as("n_found"))
    val registry = injected.filter(col(idCol) % everyK === 0)
      .select(col(idCol).as("origin_id"),
        canaryToken(col(idCol)).as("canary"),
        col(textCol).contains(canaryToken(col(idCol))).as("found_origin"))
    registry.join(hits, Seq("canary"), "left")
      .select(col("origin_id"), col("canary"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        col("found_origin"),
        (coalesce(col("n_found"), lit(0L)) > 1).as("leaked"))
  }
}
