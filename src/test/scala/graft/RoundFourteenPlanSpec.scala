package graft

/** Physical-plan contracts for the round-14 wave: the fused
  * matryoshka expression, the materialized-index probe, and (added
  * as the wave grows) the new statistics entries — pinned so a
  * refactor that silently de-optimizes fails loudly (same charter as
  * the RoundTen..Thirteen plan specs).
  */
class RoundFourteenPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("sim_matryoshka: the per-row norm pass is the codegen'd " +
    "norm_prefix_sq expression — no interpreted HOF fold survives in " +
    "the corpus scan") {
    val p = plan("sim_matryoshka")
    assert(p.contains("norm_prefix_sq"),
      s"the fused expression must carry the norm pass; plan:\n${p.take(2000)}")
    // quantize's transform() is the one legitimate lambda (it maps
    // each element once); the interpreted aggregate() FOLDS are what
    // must not come back
    assert(!"\\baggregate\\(".r.findFirstIn(p).isDefined,
      s"no interpreted aggregate() fold belongs in the hot path; plan:\n${p.take(2000)}")
    assert(!p.contains("Window") && !p.contains("Join"),
      "still a pure rollup — no window, no join")
  }

  test("dedup_probe_materialized: the index side is parquet SCANS of " +
    "the prebuilt hh/bucket tables (no shingle re-hash, no signature " +
    "explode), the delta side broadcasts, verification is the " +
    "shuffled-hash join-back") {
    val p = plan("dedup_probe_materialized")
    // index signatures must come FROM STORAGE: both prebuilt tables
    // appear as parquet FileScans of the cache dir
    assert("graft_minhash_index_[0-9a-f]+/hh".r.findFirstIn(p).isDefined,
      s"the hh table must be scanned from parquet; plan:\n${p.take(3000)}")
    assert("graft_minhash_index_[0-9a-f]+/bb".r.findFirstIn(p).isDefined,
      s"the bucket table must be scanned from parquet; plan:\n${p.take(3000)}")
    // every text-hashing site belongs to the DELTA leg: the index
    // legs are the two FileScans above, so the only scans of the
    // documents fixture are the delta filter (id >= 1000000)
    assert(!p.contains("minhash_signature(index"),
      "index signatures must not be recomputed")
    assert(p.contains("BroadcastExchange"),
      "the delta buckets/hashes must broadcast")
    assert(p.contains("ShuffledHashJoin"),
      "verification joins back by candidate id via shuffled-hash")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "no cartesian, no sort-merge on the probe path")
  }
}
