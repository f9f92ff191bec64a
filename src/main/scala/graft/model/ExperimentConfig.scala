package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** The reference's experiment configuration matrix — the four env
  * knobs every service reads and attaches to EVERY metric series as
  * constant labels (kafka_consumer/app/metrics/metrics.py:28-38;
  * option list README.md:92-145). A run picks ONE config; the labels
  * make runs comparable side-by-side in the thesis dashboards, whose
  * panel filters all key on them (thesis_dashboard.json:135,247,1231).
  *
  * In the engine the same contract is SURVEY §1.5's "config labels as
  * literal columns": [[labelCols]] yields the three constant label
  * columns (did_provider stays per-row where a query derives the
  * provider split) that ride every q1/q2/q4 groupBy, exactly like the
  * reference's `_common_labels` ride every Counter/Histogram.
  */
final case class ExperimentConfig(
    didProvider: String,
    ssiValidation: Boolean,
    cacheDid: Boolean,
    processingMode: String) {

  /** metrics.py:24-25 — did:ethr providers always cache (resolution
    * needs a chain round-trip), regardless of CACHE_DID.
    */
  def cacheDidLabel: String =
    if (cacheDid || didProvider.startsWith("did:ethr")) "true" else "false"

  /** Booleans stringify like the reference's label values
    * (metrics.py:35 `"true" if ssi_validation else "false"`).
    */
  def ssiValidationLabel: String = if (ssiValidation) "true" else "false"

  /** The three constant label columns (did_provider is query-derived
    * where the query models a mixed replay).
    */
  def labelCols: Seq[Column] = Seq(
    lit(ssiValidationLabel).as("ssi_validation"),
    lit(cacheDidLabel).as("cache_did"),
    lit(processingMode).as("processing_mode"))
}

object ExperimentConfig {

  /** The six documented configurations (README.md:95-145, options
    * 1-6 in order). Option 5 disables validation and leaves the
    * other knobs at their compose defaults (did:key, no cache,
    * sync — docker-compose.yml:174-177; settings.py:35 additionally
    * forces sync whenever SSI_VALIDATION is off).
    */
  val Options: Seq[ExperimentConfig] = Seq(
    ExperimentConfig("did:web", ssiValidation = true, cacheDid = false, "async"),
    ExperimentConfig("did:web", ssiValidation = true, cacheDid = true, "sync"),
    ExperimentConfig("did:key", ssiValidation = true, cacheDid = false, "sync"),
    ExperimentConfig("did:key", ssiValidation = true, cacheDid = true, "sync"),
    ExperimentConfig("did:key", ssiValidation = false, cacheDid = false, "sync"),
    ExperimentConfig("did:ethr:sepolia", ssiValidation = true, cacheDid = true, "sync"))

  /** The catalog's replay config — option 4 (did:key, sync, cached),
    * the thesis's headline configuration. Every batch catalog entry
    * that carries config labels uses this one; the oracle SQL embeds
    * the same constants.
    */
  val Default: ExperimentConfig = Options(3)
}
