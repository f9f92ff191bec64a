package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ExperimentConfig

/** The experiment label derivation rules (metrics.py:24-38). */
class ExperimentConfigSpec extends AnyFunSuite {

  test("did:ethr forces cache_did=true even when the knob is off") {
    val c = ExperimentConfig("did:ethr:sepolia", ssiValidation = true,
      cacheDid = false, "sync")
    assert(c.cacheDidLabel === "true")
  }

  test("non-ethr providers follow the knob") {
    assert(ExperimentConfig("did:key", true, cacheDid = false, "sync")
      .cacheDidLabel === "false")
    assert(ExperimentConfig("did:web", true, cacheDid = true, "sync")
      .cacheDidLabel === "true")
  }

  test("booleans stringify like the reference labels") {
    assert(ExperimentConfig("did:key", ssiValidation = false, false, "sync")
      .ssiValidationLabel === "false")
  }

  test("the six options carry the documented knob combinations") {
    assert(ExperimentConfig.Options.size === 6)
    assert(ExperimentConfig.Options.map(_.didProvider) ===
      Seq("did:web", "did:web", "did:key", "did:key", "did:key",
        "did:ethr:sepolia"))
    // option 5 (validation off) is forced sync (settings.py:35)
    assert(ExperimentConfig.Options(4).processingMode === "sync")
    // exactly one async config (option 1)
    assert(ExperimentConfig.Options.count(_.processingMode == "async") === 1)
  }
}
