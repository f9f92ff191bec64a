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
    memos.clear()
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
    val mit = memos.keySet.iterator()
    while (mit.hasNext) if (mit.next()._1 eq session) mit.remove()
  }

  /** Register an ALREADY-persisted frame for [[releaseAll]] — for
    * loop operators that persist per-round and hand back the final
    * round's frame (BPE's vocab loop).
    */
  def register(df: DataFrame): DataFrame = { live.add(df); df }

  private val memos =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), DataFrame]()

  /** Session-scoped MEMOIZED staging: several independent catalog
    * entries derive from one expensive shared intermediate (the
    * minhash pair table feeds dedup_clusters, dedup_cluster_sizes
    * AND dedup_keep_one — three full pair-pipeline executions per
    * board run without sharing). `memo` returns the live staged
    * frame for `(session, key)` when one exists, else builds,
    * persists, and registers it. Each entry stays independently
    * runnable — whichever runs first builds the table; a
    * [[releaseAll]] between queries (the bench harness) voids the
    * memo (storageLevel drops to NONE) so per-query timings still
    * charge full cost. Callers must pick keys that capture EVERY
    * input that changes the frame (the sf dir, parameters).
    */
  def memo(session: org.apache.spark.sql.SparkSession, key: String)
          (build: => DataFrame): DataFrame = {
    val k = (session, key)
    val cur = memos.get(k)
    if (cur != null && cur.storageLevel != StorageLevel.NONE) cur
    else memos.synchronized {
      val again = memos.get(k)
      if (again != null && again.storageLevel != StorageLevel.NONE) again
      else {
        val built = persist(build)
        memos.put(k, built)
        built
      }
    }
  }

  /** `.stage()` chain syntax for [[persist]]. */
  implicit class Staged(private val df: DataFrame) extends AnyVal {
    def stage(): DataFrame = Staging.persist(df)
  }
}
