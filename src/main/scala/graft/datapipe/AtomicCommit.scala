package graft.datapipe

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe APPENDs for parquet tables that serve while being grown
  * (the stored minhash/vector indexes): a plain
  * `write.mode("append")` into a live directory exposes partial part
  * files to any concurrent (or post-crash) reader — parquet has no
  * multi-file commit, so a killed append leaves a directory that
  * readers cannot distinguish from a complete one.
  *
  * The contract here is the classic staged-directory protocol every
  * table format (Hive `_temporary`, Iceberg/Delta manifests) builds
  * on: the delta is written as a COMPLETE parquet dataset into a
  * sibling staging directory (`<table>.staging/<id>`), and only after
  * the write finishes (Spark's own `_SUCCESS` marker) is the staged
  * directory published into `<table>.deltas/<id>` with ONE atomic
  * filesystem rename. Readers ([[read]]) scan the base directory plus
  * the committed delta directories only — a crash mid-write leaves
  * garbage in `.staging/` that no reader ever lists, and a crash
  * between rename and nothing is impossible (the rename IS the
  * commit). Idempotency across RE-DELIVERED deltas remains the
  * caller's ledger contract (see [[Dedup.minhashIndexAppend]]); what
  * this removes is the torn-write window inside one delivery.
  *
  * At 100 TB the delta dirs are the daily ingest partitions; readers
  * pass all committed roots to one multi-root parquet scan, so
  * partition pruning and column pruning behave exactly as on a single
  * root (each root carries the same `cell=N` directory layout).
  */
object AtomicCommit {

  private def stagingRoot(target: String) = s"$target.staging"
  private def deltasRoot(target: String) = s"$target.deltas"

  /** Every readable root of the table at `target`: the base directory
    * (if present) plus each COMMITTED delta directory, in committed-
    * name order. A delta directory missing its `_SUCCESS` marker is
    * never returned (it can only exist if an external tool copied a
    * torn directory in — the rename protocol itself publishes
    * complete writes only).
    */
  def committedPaths(target: String): Seq[String] = {
    val base =
      if (new java.io.File(target).isDirectory) Seq(target) else Seq.empty
    val deltas = Option(new java.io.File(deltasRoot(target)).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(d => d.isDirectory && new java.io.File(d, "_SUCCESS").exists())
      .sortBy(_.getName)
      .map(_.getPath)
    base ++ deltas
  }

  /** One scan PER committed root (base + deltas), unioned — Spark's
    * partition discovery refuses sibling roots in a single load, and
    * per-root loads keep the `cell=N` inference intact. Partition
    * filters push through the Union into every branch's scan, so
    * pruning behaves exactly as on a single root; with zero deltas
    * (the common case) this IS the single-root scan.
    */
  def read(spark: SparkSession, target: String): DataFrame = {
    val paths = committedPaths(target)
    require(paths.nonEmpty, s"no committed data at $target")
    paths.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Run `write` against a fresh staging directory, then publish it
    * with one atomic rename. If `write` throws (executor loss, kill),
    * the staged directory is abandoned where no reader looks; the
    * table's committed view is unchanged.
    *
    * `commitId` makes the append IDEMPOTENT at the protocol level:
    * the committed delta directory is named by it, so a REDELIVERED
    * append (stream-sink restart, at-least-once upstream) with the
    * same id is a no-op — checked before the write (cheap skip) and
    * again at the rename (two racing deliveries: exactly one rename
    * wins, the loser's staging dir is discarded). Callers with a
    * natural run identity (a streaming batchId, an ingest-day key)
    * should pass it and drop their side ledger; without one, a
    * random id preserves plain append-anything semantics.
    */
  def commitAppend(target: String, commitId: Option[String] = None)
                  (write: String => Unit): Unit = {
    val id = commitId.getOrElse(java.util.UUID.randomUUID().toString)
    require(id.nonEmpty && !id.contains('/') && !id.contains('\\') &&
      id != "." && id != "..",
      s"commitId must be a plain directory name, got '$id'")
    val dst = Paths.get(deltasRoot(target), id)
    if (Files.exists(dst)) return // already committed — idempotent replay
    // staging name stays unique even under a duplicate commitId, so
    // two racing deliveries never write into the same staged dir
    val staging = Paths.get(stagingRoot(target),
      s"$id-${java.util.UUID.randomUUID()}")
    Files.createDirectories(staging.getParent)
    write(staging.toString)
    require(Files.exists(staging.resolve("_SUCCESS")),
      s"staged write at $staging finished without _SUCCESS; refusing to commit")
    Files.createDirectories(dst.getParent)
    try Files.move(staging, dst, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // a concurrent delivery of the same commitId won the rename;
        // this copy is redundant by definition — discard it
        deleteRecursively(staging)
    }
  }

  private[datapipe] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }

  /** The live VERSION directory of an index rooted at `path`: the
    * MANIFEST target when one exists, else `path` itself (legacy
    * flat layout). One bounded driver read; shared by the vector
    * index and the minhash index roots.
    */
  def resolveVersionRoot(path: String): String = {
    val m = Paths.get(path, "MANIFEST")
    if (Files.exists(m))
      s"$path/${new String(Files.readAllBytes(m),
        java.nio.charset.StandardCharsets.UTF_8).trim}"
    else path
  }

  /** The next unused `v<n>` version name under `path`. */
  def nextVersion(path: String): String = {
    val n = Option(new java.io.File(path).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toInt)
      .foldLeft(0)(math.max) + 1
    s"v$n"
  }

  /** Atomically (re)point a single-file manifest at `value` — the
    * version-swap commit for rebuilt indexes: write-to-temp +
    * ATOMIC_MOVE, so a concurrent reader sees either the old or the
    * new version name, never a torn file.
    */
  def writeManifest(manifest: Path, value: String): Unit = {
    val tmp = manifest.resolveSibling(manifest.getFileName.toString + ".tmp")
    Files.write(tmp, value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
