package graft.datapipe

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** THE staging-cache convention, in one place (every bare `.persist`
  * in the dedup/relevance/similarity operators routes through here).
  *
  * Several operators materialize an intermediate table that feeds two
  * or more downstream branches (both sides of a band self-join, a
  * join-back, a df aggregation): without `persist()` each branch
  * re-runs the text→hash pipeline from the scan, and Catalyst's
  * inferred join-key null filters can serialize that recomputation
  * onto the scan's few input splits (measured pathologies documented
  * at each call site). Those caches are **session-scoped by design**:
  * the operator cannot unpersist before returning, because its result
  * DataFrame is lazy and still reads the staged table when the CALLER
  * runs the first action.
  *
  * What bounds accumulation across repeated invocations in one
  * session:
  *  - every staged frame registers here; [[releaseAll]] unpersists
  *    everything staged so far (called by harness mains between
  *    queries; library users call it once downstream actions have
  *    consumed an operator's result);
  *  - `spark.catalog.clearCache()` is a coarser equivalent (drops ALL
  *    cached data, staged or not);
  *  - `MEMORY_AND_DISK` means an unreleased cache degrades to disk
  *    spill, never an executor OOM.
  *
  * The exception to the convention: operators whose staging is fully
  * consumed by an eager action *inside* the operator (the quantizer
  * trainers' `pqCodebooks`/`kmeansCentroids`) unpersist in
  * `try/finally` at the call site instead — nothing outlives the call
  * there, so the registry would only delay the release.
  */
object Staging {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist a staging DataFrame (MEMORY_AND_DISK) and register it
    * for [[releaseAll]]. Returns the persisted frame.
    */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(p)
    p
  }

  /** Unpersist every registered staging frame (non-blocking). Safe to
    * call at any time: an already-unpersisted frame is a no-op, and a
    * staged frame still referenced by a live lazy result merely loses
    * its cache (the result recomputes, still correct).
    *
    * Concurrency hazard, documented for library adopters: the
    * registry is PROCESS-global, so a releaseAll() from one thread
    * also drops caches another thread's in-flight query is still
    * reading (correct but recomputed). Multi-tenant apps sharing one
    * JVM should release per session ([[releaseAll(session)]]) at
    * their own quiesce points. Strong refs are deliberate: an
    * unpersist needs the frame, so a weak registry would strand
    * caches in the session's CacheManager once the frame is GC'd.
    */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) { df.unpersist(false); df = live.poll() }
  }

  /** Unpersist only the staged frames belonging to `session` —
    * the bound a long-lived multi-session app needs so one tenant's
    * release never forces another tenant's recompute.
    */
  def releaseAll(session: org.apache.spark.sql.SparkSession): Unit = {
    val it = live.iterator()
    while (it.hasNext) {
      val df = it.next()
      if (df.sparkSession eq session) { df.unpersist(false); it.remove() }
    }
  }

  /** Register an ALREADY-persisted frame for [[releaseAll]] — for
    * loop operators that persist per-round and hand back the final
    * round's frame (BPE's vocab loop).
    */
  def register(df: DataFrame): DataFrame = { live.add(df); df }

  /** `.stage()` chain syntax for [[persist]]. */
  implicit class Staged(private val df: DataFrame) extends AnyVal {
    def stage(): DataFrame = Staging.persist(df)
  }
}
