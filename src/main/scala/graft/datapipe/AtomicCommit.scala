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
  *
  * WRITER CONTRACT for the versioned-index lifecycle built on this
  * protocol ([[VectorIndex]], [[Dedup.minhashIndexCompact]]):
  * APPENDS may run concurrently with maintenance — a compact/rebuild
  * re-lists the live version's committed deltas right before its
  * MANIFEST swap and folds forward any commit that landed after its
  * snapshot, and the per-table FOLDED ledger ([[foldedIds]]) carries
  * every folded commit-id into the new version so a redelivery
  * straddling the swap stays a no-op. MAINTENANCE itself is
  * single-writer: run at most one compact/rebuild/vacuum per index
  * root at a time (two concurrent maintenance runs can race the same
  * `v<n>` name and the MANIFEST swap). An append that commits into a
  * version superseded mid-flight is never lost: it is ORPHANED, the
  * next compact folds it forward from the superseded root, and
  * vacuum REFUSES to sweep while any orphan exists.
  */
object AtomicCommit {

  private def stagingRoot(target: String) = s"$target.staging"
  private def deltasRoot(target: String) = s"$target.deltas"
  private def foldedPath(target: String) = Paths.get(s"$target.folded")

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

  /** The commit-ids of the COMMITTED delta directories of `target`
    * (directory names, committed order) — the filesystem half of the
    * table's committed set.
    */
  def committedDeltaIds(target: String): Seq[String] =
    Option(new java.io.File(deltasRoot(target)).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(d => d.isDirectory && new java.io.File(d, "_SUCCESS").exists())
      .map(_.getName).sorted

  /** Commit-ids whose rows are already folded into this table's BASE
    * by a maintenance rewrite (compact/rebuild) — the one-file ledger
    * (`<table>.folded`, one id per line) that keeps commitId
    * idempotency ACROSS version swaps: without it, a stream
    * redelivery straddling a rebuild would re-append rows the rebuild
    * already folded into the new base.
    */
  def foldedIds(target: String): Set[String] =
    if (Files.exists(foldedPath(target)))
      new String(Files.readAllBytes(foldedPath(target)),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSet
    else Set.empty

  /** Atomically (re)write the folded-commit ledger of `target` —
    * written ONCE per version by the maintenance rewrite, before the
    * MANIFEST swap publishes the version.
    */
  def writeFoldedIds(target: String, ids: Set[String]): Unit = {
    val p = foldedPath(target)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, ids.toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Every commit-id whose rows are READABLE at `target`: committed
    * delta dirs plus the folded ledger. The orphan test — a commit-id
    * present in a superseded version but absent here — is a set diff
    * over these.
    */
  def committedIds(target: String): Set[String] =
    committedDeltaIds(target).toSet ++ foldedIds(target)

  /** Version roots of the index at `path` that are NOT the live one:
    * every `v<n>` directory other than the MANIFEST target, plus
    * `path` itself (the legacy flat root, superseded the moment a
    * MANIFEST exists). Empty for a flat (un-versioned) index. Callers
    * probe each root for their own table names — a root without the
    * table contributes nothing.
    */
  def supersededRoots(path: String): Seq[String] = {
    if (!Files.exists(Paths.get(path, "MANIFEST"))) return Seq.empty
    val live = resolveVersionRoot(path)
    Option(new java.io.File(path).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getPath).filterNot(_ == live) :+ path
  }

  /** Orphaned deltas of table `table` under the versioned index at
    * `path`: (supersededRoot, commitId) pairs committed into a
    * superseded version and absent from the live version's committed
    * set — an append that raced a maintenance swap. The next compact
    * folds these forward; [[VectorIndex.vacuum]] /
    * [[Dedup.minhashVacuum]] refuse while any exist.
    */
  def orphanedDeltas(path: String, table: String): Seq[(String, String)] = {
    val liveSet = committedIds(s"${resolveVersionRoot(path)}/$table")
    supersededRoots(path).flatMap { r =>
      committedDeltaIds(s"$r/$table").filterNot(liveSet).map(r -> _)
    }
  }

  /** Recursive copy with the walk stream closed. Used by the
    * maintenance fold-forward (a committed delta dir is a complete
    * parquet dataset — copying it under a new version preserves both
    * the data and the `_SUCCESS` marker the commit protocol checks).
    */
  def copyDir(from: String, to: String): Unit = {
    val src = Paths.get(from)
    val s = Files.walk(src)
    try s.forEach { p =>
      val dst = Paths.get(to).resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else Files.copy(p, dst)
    } finally s.close()
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
    readPaths(spark, paths)
  }

  /** [[read]] over an EXPLICIT root list — the maintenance snapshot
    * shape: compact/rebuild list the committed roots once, read
    * exactly that list, and treat any commit landing later as a
    * fold-forward candidate, so "what the rewrite folded" is a
    * driver-side value, never a re-listing race.
    */
  def readPaths(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no roots to read")
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
    if (foldedIds(target).contains(id)) return // folded into the base
    // by a past compact/rebuild — a redelivery across a version swap
    // is the same no-op as one against the version that committed it
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
      // a concurrent delivery of the same commitId won the rename;
      // this copy is redundant by definition — discard it. On Linux,
      // rename(2) onto an existing EMPTY dir is EEXIST
      // (FileAlreadyExistsException) but onto a non-empty one is
      // ENOTEMPTY, which the JDK surfaces as a plain
      // FileSystemException — both mean "dst already committed", so
      // the guard is the dst recheck, not the exception subtype.
      case e: java.nio.file.FileSystemException if Files.exists(dst) =>
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
