package graft.datapipe

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSimilarity

/** MATERIALIZED IVF index lifecycle — the vector sibling of the
  * minhash recrawl loop ([[Dedup.minhashIndexTable]] /
  * `minhashProbePrebuilt` / `minhashIndexAppend`): a production ANN
  * stack trains its coarse quantizer ONCE, persists (centroids,
  * cell-partitioned vectors) as parquet, answers every query batch
  * from the stored index, folds new vectors in delta-sized, and
  * RETRAINS (with an atomic version swap) when append drift degrades
  * the cell layout — re-training per query run (what [[Similarity
  * .ivfTopKKmeans]] necessarily does as a self-contained query)
  * re-pays the whole trainer at every probe and is the shape no
  * serving system ships.
  *
  * On disk (one index VERSION):
  *  - `<root>/centroids`: (cell, s array<long>, n long) — the exact
  *    integer (component-sum, count) pairs [[Similarity.
  *    kmeansCentroids]] trains (never divided, so the parquet
  *    roundtrip is bit-exact and any engine replays the same
  *    assignment arithmetic from the stored rows).
  *  - `<root>/vectors`: (vec_id, emb) PARTITIONED BY cell — the
  *    100 TB layout every IVF scaladoc in [[Similarity]] points at:
  *    the probe's cell restriction becomes scan-level PARTITION
  *    pruning (non-probed cells are never read, `PartitionFilters`
  *    in the scan node), not a post-scan filter.
  *  - `<root>/vectors.deltas/<id>`: committed [[append]] deltas,
  *    published by [[AtomicCommit]]'s staged-write + atomic-rename
  *    protocol — a killed append can never leave partial files where
  *    a probe reads (the torn-write negative test in VectorIndexSpec
  *    pins it). Readers scan base + committed deltas as one
  *    multi-root pruned scan.
  *
  * VERSIONING ([[rebuild]]): `<path>/MANIFEST` names the live version
  * directory (`v1`, `v2`, …) under `<path>`; no MANIFEST means the
  * legacy flat layout (the version IS `<path>`). [[rebuild]] retrains
  * from the stored vectors into the NEXT version directory and then
  * swaps the MANIFEST with one atomic rename — a probe concurrent
  * with (or after a crash during) a rebuild reads either the complete
  * old version or the complete new one, never a half-index.
  *
  * [[probe]] is row-identical to the retrain path
  * (`ivfTopKKmeans(emb, q, k, cells, iters, nprobe)` — VectorIndexSpec
  * pins it) but runs ZERO training jobs: centroids come back as one
  * bounded driver read (cells·dim longs, ≤ 4096·dim by the
  * [[Similarity.autoCells]] clamp), and the only corpus touch is the
  * pruned scan of the probed cells. [[append]] assigns the delta with
  * the STORED centroids (one delta-sized projection) and commits into
  * the delta directories — no corpus rewrite, no retrain, exactly the
  * minhash append contract. Centroid drift under sustained appends is
  * [[indexStats]]'s skew readout → [[rebuild]].
  */
object VectorIndex {

  /** The live version directory of the index at `path`: the MANIFEST
    * target when one exists, else `path` itself (legacy flat layout —
    * what [[build]]/[[buildPq]] write). One bounded driver read.
    */
  def resolveRoot(path: String): String =
    AtomicCommit.resolveVersionRoot(path)

  /** Base + committed-delta multi-root scan of the live version's
    * vectors table (partition-pruned like a single root — every root
    * carries the same `cell=N` layout).
    */
  private def readVectors(spark: SparkSession, root: String): DataFrame =
    AtomicCommit.read(spark, s"$root/vectors")

  /** Queries MATERIALIZED to a bounded local relation — the probe
    * contract already broadcasts the query batch (serving batches are
    * bounded by premise), and materializing it first makes the
    * probed-cell collect and the join input the SAME rows by
    * construction: a nondeterministic queries plan (sample, rand, an
    * uncheckpointed source) can no longer yield a probed-cell set
    * that diverges from the join side and silently drop results.
    */
  private def localizeQueries(queries: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries
      .select(col("q_id").cast("long"),
        col("q_emb").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
      .toDF("q_id", "q_emb")
  }

  /** Train and persist the index: centroids + cell-partitioned
    * vectors. `cells = 0` self-sizes via [[Similarity.autoCells]].
    * One training pass ([[Similarity.kmeansCentroids]] — k seed rows
    * + k (sum, count) rows per Lloyd's round to the driver) and one
    * corpus write shuffled only by the partitionBy exchange.
    */
  def build(emb: DataFrame, path: String, cells: Int = 0,
            iters: Int = 3): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col("vec_id"), col("emb"))
    val sized =
      if (cells > 0) cells
      else Similarity.autoCells(e.filter(col("emb").isNotNull).count())
    val cents = Similarity.kmeansCentroids(e, sized, iters)
    cents.zipWithIndex
      .map { case ((s, n), c) => (c.toLong, s.toSeq, n) }
      .toSeq.toDF("cell", "s", "n")
      .coalesce(1) // cells rows — one footer, one driver read-back
      .write.mode("overwrite").parquet(s"$path/centroids")
    // one hash exchange on the partition key, then partition-local
    // writes — bounds the file count by cells, not tasks × cells
    e.select(col("vec_id"), col("emb"),
        Similarity.kmeansAssignCol(Similarity.quantize(col("emb")),
          cents.toSeq).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/vectors")
  }

  /** RETRAIN the index from its own stored vectors into the next
    * version directory and swap the MANIFEST atomically — the
    * lifecycle leg that answers append drift: [[append]] never moves
    * centroids, so a drifting ingest concentrates into few cells
    * ([[indexStats]] skew ≫ 1) and candidate lists outgrow the
    * per-cell design point; rebuild re-levels the layout from the
    * full stored corpus (base + every committed delta).
    *
    * Crash/concurrency contract: training and the full re-write land
    * in `<path>/v<n+1>` while every reader still resolves the old
    * version through the MANIFEST; the one-file atomic manifest swap
    * ([[AtomicCommit.writeManifest]]) is the commit. A rebuild killed
    * at ANY point leaves the old version fully live. Old version
    * directories are kept (the caller's retention policy decides when
    * to drop them — probes in flight may still hold the old root).
    *
    * Cost: one full corpus re-train + re-write — the operation is
    * O(index), which is exactly why [[append]] exists for the daily
    * path and rebuild is gated on the [[indexStats]] readout.
    */
  def rebuild(spark: SparkSession, path: String, cells: Int = 0,
              iters: Int = 3): Unit = {
    val cur = resolveRoot(path)
    val (snapPaths, snapIds) = snapshot(cur)
    val vecs = AtomicCommit.readPaths(spark, snapPaths)
      .select(col("vec_id"), col("emb"))
    val next = nextVersion(path)
    build(vecs, s"$path/$next", cells, iters)
    finishMaintenance(spark, path, cur, next, snapIds)
  }

  /** The committed roots of `root`'s vectors table, listed ONCE:
    * (paths to read, delta commit-ids in them). Everything the
    * maintenance rewrite folds is exactly this driver-side list —
    * a delta committing later is a fold-forward candidate, never a
    * silently-half-read one.
    */
  private def snapshot(root: String): (Seq[String], Seq[String]) = {
    val ids = AtomicCommit.committedDeltaIds(s"$root/vectors")
    val base =
      if (new java.io.File(s"$root/vectors").isDirectory)
        Seq(s"$root/vectors")
      else Seq.empty
    (base ++ ids.map(id => s"$root/vectors.deltas/$id"), ids)
  }

  /** The shared tail of every maintenance rewrite (compact/rebuild,
    * plain and PQ), in commit order: (1) write the new version's
    * FOLDED ledger = the old ledger ∪ the snapshot's delta ids, so a
    * redelivery of any folded commit stays a no-op across the swap;
    * (2) fold forward every delta the snapshot missed — commits that
    * landed in the (still-live) current version after the snapshot,
    * and orphans stranded in superseded roots by an earlier race —
    * re-assigned/re-encoded against the NEW version's quantizers
    * (delta-sized work; a dir copy would carry stale cell
    * assignments after a retrain); (3) swap the MANIFEST. A commit
    * racing past step 2's re-listing is not lost either: it becomes
    * an orphan in the superseded version, [[vacuum]] refuses while
    * it exists, and the next compact folds it in here.
    */
  private def finishMaintenance(spark: SparkSession, path: String,
                                cur: String, next: String,
                                snapIds: Seq[String]): Unit = {
    val nextRoot = s"$path/$next"
    AtomicCommit.writeFoldedIds(s"$nextRoot/vectors",
      AtomicCommit.foldedIds(s"$cur/vectors") ++ snapIds)
    val missed =
      AtomicCommit.committedDeltaIds(s"$cur/vectors")
        .filterNot(snapIds.toSet).map(cur -> _) ++
      AtomicCommit.supersededRoots(path)
        .filterNot(_ == nextRoot).flatMap { r =>
          AtomicCommit.committedDeltaIds(s"$r/vectors").map(r -> _)
        }
    val already = AtomicCommit.committedIds(s"$nextRoot/vectors")
    missed.filterNot { case (_, id) => already(id) }
      .foreach { case (r, id) =>
        appendInto(spark, nextRoot,
          spark.read.parquet(s"$r/vectors.deltas/$id")
            .select(col("vec_id"), col("emb")), Some(id))
      }
    AtomicCommit.writeManifest(Paths.get(path, "MANIFEST"), next)
  }

  /** [[append]]/[[appendPq]] against an EXPLICIT version root —
    * picks the PQ shape when the root carries codebooks. Used by the
    * maintenance fold-forward, which must target the not-yet-live
    * next version.
    */
  private def appendInto(spark: SparkSession, root: String,
                         delta: DataFrame,
                         commitId: Option[String]): Unit = {
    val cents = loadCentroids(spark, root)
    val pq = Files.isDirectory(Paths.get(s"$root/codebooks"))
    AtomicCommit.commitAppend(s"$root/vectors", commitId) { staging =>
      val assigned =
        if (pq) {
          val cbs = loadCodebooks(spark, root)
          delta.select(col("vec_id"), col("emb"),
            Similarity.pqCodeCol(cbs, cbs.head.head._1.length).as("code"),
            Similarity.kmeansAssignCol(Similarity.quantize(col("emb")),
              cents).as("cell"))
        } else delta.select(col("vec_id"), col("emb"),
          Similarity.kmeansAssignCol(Similarity.quantize(col("emb")),
            cents).as("cell"))
      assigned.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(staging)
    }
  }

  /** [[rebuild]] for the COMPRESSED index: retrains the coarse
    * quantizer AND the PQ codebooks from the stored vectors (both
    * drift-frozen under [[appendPq]]), re-encodes every vector, and
    * swaps the MANIFEST atomically — same crash contract as
    * [[rebuild]].
    */
  def rebuildPq(spark: SparkSession, path: String, cells: Int = 0,
                iters: Int = 3, subspaces: Int = 8, kcents: Int = 16,
                pqIters: Int = 2): Unit = {
    val cur = resolveRoot(path)
    val (snapPaths, snapIds) = snapshot(cur)
    val vecs = AtomicCommit.readPaths(spark, snapPaths)
      .select(col("vec_id"), col("emb"))
    val next = nextVersion(path)
    buildPq(vecs, s"$path/$next", cells, iters, subspaces, kcents, pqIters)
    finishMaintenance(spark, path, cur, next, snapIds)
  }

  /** COMPACT the live version's base + committed deltas into the
    * next version directory WITHOUT retraining — the small-file
    * maintenance leg between [[append]] (daily) and [[rebuild]]
    * (drift-triggered): sustained appends accumulate one delta
    * directory per commit, and at 100 TB a probe's file listing and
    * per-cell open count grow with commit count even though the data
    * doesn't. Compaction rewrites the vectors (every column,
    * including PQ `code` when present) into fresh cell partitions —
    * one hash exchange on the partition key, file count re-bounded
    * by cells — and copies the training artifacts (centroids, and
    * codebooks when present) unchanged: assignments are preserved
    * because the quantizer is, so a probe against the compacted
    * version is bit-identical to one against base + deltas
    * (RoundSeventeenOpsSpec pins it). Same atomic MANIFEST-swap
    * commit as [[rebuild]]: a killed compaction leaves the old
    * version fully live.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val cur = resolveRoot(path)
    val next = nextVersion(path)
    spark.read.parquet(s"$cur/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$next/centroids")
    if (Files.isDirectory(Paths.get(s"$cur/codebooks")))
      spark.read.parquet(s"$cur/codebooks").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/$next/codebooks")
    val (snapPaths, snapIds) = snapshot(cur)
    AtomicCommit.readPaths(spark, snapPaths)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/$next/vectors")
    finishMaintenance(spark, path, cur, next, snapIds)
  }

  /** Drop every NON-LIVE version directory (and, once a MANIFEST
    * exists, the superseded legacy flat artifacts) — the retention
    * sweep after [[rebuild]]/[[compact]] cycles. Old versions are
    * kept by default precisely because probes in flight may still
    * hold their root; vacuum is the CALLER's declaration that no
    * reader predates the current MANIFEST. A flat (un-versioned)
    * index is untouched. Idempotent; crash-safe trivially (deleting
    * a dir no reader resolves).
    *
    * ORPHAN GUARD: REFUSES (IllegalStateException) while any
    * superseded root still holds a committed delta absent from the
    * live version's committed set ([[AtomicCommit.orphanedDeltas]])
    * — an append that raced a maintenance swap. Sweeping it here
    * would be the one way the protocol loses an acknowledged commit;
    * run [[compact]] first (it folds orphans forward), then vacuum.
    */
  def vacuum(path: String): Unit = {
    val m = Paths.get(path, "MANIFEST")
    if (!Files.exists(m)) return
    val orphans = AtomicCommit.orphanedDeltas(path, "vectors")
    if (orphans.nonEmpty)
      throw new IllegalStateException(
        "vacuum refused: superseded versions hold committed deltas " +
          "the live version never folded (an append raced a " +
          "compact/rebuild) — run compact to fold them forward, then " +
          "vacuum. Orphans: " +
          orphans.map { case (r, id) => s"$r/vectors.deltas/$id" }
            .mkString(", "))
    val live = new String(Files.readAllBytes(m),
      java.nio.charset.StandardCharsets.UTF_8).trim
    Option(new java.io.File(path).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        f.getName != live)
      .foreach(f => AtomicCommit.deleteRecursively(f.toPath))
    Seq("centroids", "codebooks", "vectors", "vectors.deltas",
        "vectors.staging", "vectors.folded")
      .foreach(nm => AtomicCommit.deleteRecursively(Paths.get(path, nm)))
  }

  private def nextVersion(path: String): String =
    AtomicCommit.nextVersion(path)

  /** The stored coarse quantizer of the LIVE version, cell-ordered —
    * bounded driver state (cells·dim longs, the same rows every
    * Lloyd's round already ships).
    */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Array[Long], Long)] = {
    import spark.implicits._
    spark.read.parquet(s"${resolveRoot(path)}/centroids")
      .orderBy(col("cell"))
      .select(col("s"), col("n")).as[(Seq[Long], Long)]
      .collect().map { case (s, n) => (s.toArray, n) }.toSeq
  }

  /** Fold `delta` (vec_id, emb) into the stored index WITHOUT
    * retraining: assign each delta vector with the stored centroids
    * (one codegen projection over the delta only) and COMMIT the
    * cell-partitioned rows via [[AtomicCommit]] — staged write,
    * atomic rename, so a killed append exposes nothing to probes
    * (VectorIndexSpec's torn-write test). Cost is delta-assign +
    * delta-write, independent of the standing index size.
    * Pass `commitId` (a streaming batchId, an ingest-day key) to make
    * redelivery a protocol-level no-op — no side ledger needed
    * (StreamingSpec's ingest twin); without one, replaying the same
    * delta plants duplicate rows (plain append semantics).
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
             commitId: Option[String] = None): Unit = {
    val root = resolveRoot(path)
    val cents = loadCentroids(spark, root)
    AtomicCommit.commitAppend(s"$root/vectors", commitId) { staging =>
      delta.select(col("vec_id"), col("emb"),
          Similarity.kmeansAssignCol(Similarity.quantize(col("emb")),
            cents).as("cell"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(staging)
    }
  }

  /** Train and persist the COMPRESSED index — coarse quantizer plus
    * PQ codebooks and per-vector codes, the full IVF-PQ serving
    * artifact: `<path>/centroids` and a cell-partitioned
    * `<path>/vectors` as in [[build]], but each vector row also
    * carries its `subspaces`-int PQ `code`, and
    * `<path>/codebooks` stores the per-subspace (cell, s, n) exact
    * integer codebooks. At 100 TB the probe's stage-1 scan projects
    * ONLY (vec_id, code) — parquet column pruning makes the
    * 4-byte-code memory-bandwidth claim real on the stored layout —
    * and the full vectors are read only for the bounded exact
    * rescore.
    */
  def buildPq(emb: DataFrame, path: String, cells: Int = 0,
              iters: Int = 3, subspaces: Int = 8, kcents: Int = 16,
              pqIters: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col("vec_id"), col("emb"))
    val sized =
      if (cells > 0) cells
      else Similarity.autoCells(e.filter(col("emb").isNotNull).count())
    val coarse = Similarity.kmeansCentroids(e, sized, iters)
    coarse.zipWithIndex
      .map { case ((s, n), c) => (c.toLong, s.toSeq, n) }
      .toSeq.toDF("cell", "s", "n")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val subDim = Similarity.pqSubDim(e, subspaces)
    val cbs = Similarity.pqCodebooks(e, subspaces, kcents, pqIters)
    cbs.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case ((sv, n), c) =>
        (s.toLong, c.toLong, sv.toSeq, n) }
    }.toSeq.toDF("subspace", "cell", "s", "n")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    e.select(col("vec_id"), col("emb"),
        Similarity.pqCodeCol(cbs, subDim).as("code"),
        Similarity.kmeansAssignCol(Similarity.quantize(col("emb")),
          coarse.toSeq).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/vectors")
  }

  /** The stored PQ codebooks of the live version, (subspace, cell)-
    * ordered. */
  def loadCodebooks(spark: SparkSession,
                    path: String): IndexedSeq[Seq[(Array[Long], Long)]] = {
    import spark.implicits._
    spark.read.parquet(s"${resolveRoot(path)}/codebooks")
      .orderBy(col("subspace"), col("cell"))
      .select(col("subspace"), col("s"), col("n"))
      .as[(Long, Seq[Long], Long)].collect()
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map { case (_, s, n) => (s.toArray, n) }.toSeq }
  }

  /** Fold `delta` into the stored COMPRESSED index: assign with the
    * stored coarse centroids AND encode with the stored codebooks —
    * both one delta-sized projection — then commit via
    * [[AtomicCommit]] (same torn-write immunity as [[append]]). No
    * retrain of either quantizer.
    */
  def appendPq(spark: SparkSession, path: String, delta: DataFrame,
               commitId: Option[String] = None): Unit = {
    val root = resolveRoot(path)
    val coarse = loadCentroids(spark, root)
    val cbs = loadCodebooks(spark, root)
    val subDim = cbs.head.head._1.length
    AtomicCommit.commitAppend(s"$root/vectors", commitId) { staging =>
      delta.select(col("vec_id"), col("emb"),
          Similarity.pqCodeCol(cbs, subDim).as("code"),
          Similarity.kmeansAssignCol(Similarity.quantize(col("emb")),
            coarse).as("cell"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(staging)
    }
  }

  /** IVF-PQ serving from the STORED index — row-identical to
    * [[Similarity.ivfPqTopK]] (VectorIndexSpec pins it) with zero
    * training jobs: stored centroids rank each query's `nprobe`
    * cells, the partition-pruned scan projects only (vec_id, code)
    * for ADC against the query's stored-codebook lookup tables, and
    * the `refine·k` survivors rescore exact from the same table's
    * `emb` column (a second pruned scan bounded by the candidate
    * set). The query batch is materialized once
    * ([[localizeQueries]]), so the probed-cell set and the join input
    * can never diverge.
    */
  def probePq(spark: SparkSession, path: String, queries: DataFrame,
              k: Int, nprobe: Int = 3, refine: Int = 4): DataFrame = {
    val root = resolveRoot(path)
    val coarse = loadCentroids(spark, root)
    val cbs = loadCodebooks(spark, root)
    val subspaces = cbs.size
    val subDim = cbs.head.head._1.length
    // ONE materialization feeds the LUT projection AND the exact
    // rescore join — a nondeterministic queries plan can no longer
    // diverge between the two stages
    val local = localizeQueries(queries)
    val qLuts = local.select(
      Seq(col("q_id"),
        explode(Similarity.kmeansProbesCol(Similarity.quantize(col("q_emb")),
          coarse, nprobe)).as("q_cell")) ++
        Similarity.pqLutCols(cbs, subDim): _*)
    val probed = qLuts.select(col("q_cell")).distinct()
      .collect().map(_.getLong(0).toInt).toSeq
    // every rescore candidate comes from a probed cell, so BOTH
    // stages read the same partition-pruned scan — the exact rescore
    // never touches a non-probed cell's files either
    val pruned = readVectors(spark, root)
      .filter(col("cell").isInCollection(probed))
    val codes = pruned
      .select(col("vec_id"), col("code"), col("cell").cast("long").as("cell"))
    val approx = codes
      .join(broadcast(qLuts),
        col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumn("ascore", -Similarity.pqAdistCol(subspaces))
    Similarity.refineStage(approx,
      pruned.select(col("vec_id"), col("emb")),
      local, k, refine)
  }

  /** Semantic decontamination against an INDEXED eval set — the
    * documented escape hatch of [[Similarity.decontaminateSemantic]]
    * for eval sets too large to broadcast: the EVAL SET is the
    * stable artifact, so it is what gets indexed ([[build]] over the
    * eval vectors, once), and every corpus vector probes its
    * `nprobe` nearest eval cells for the max cosine. Cost per corpus
    * row is nprobe·(|eval|/cells) candidates instead of |eval|; the
    * price is the IVF recall trade — an eval neighbour in a
    * non-probed cell is missed, so verdicts are a LOWER bound on
    * contamination (`nprobe = cells` recovers the exact form;
    * VectorIndexSpec quantifies the gap). Corpus rows with no
    * candidate (or null embeddings) stay in the audit with null max
    * and contaminated = false — the [[Similarity
    * .decontaminateSemantic]] degenerate contract.
    *
    * Scale shape: one codegen probe projection over the corpus, one
    * cell-co-partitioned shuffle-hash join against the eval scan
    * restricted through the join KEY (a corpus-wide distinct-collect
    * of probed cells — what a static partition filter would take —
    * is an extra corpus pass, and the corpus probes most cells
    * anyway; the per-PROBE pruning that pays is [[probe]]'s, where
    * the query batch is bounded), one (vec_id, max) rollup.
    */
  def decontaminateIndexed(spark: SparkSession, evalIndexPath: String,
                           emb: DataFrame, threshold: Double,
                           nprobe: Int = 3): DataFrame = {
    val root = resolveRoot(evalIndexPath)
    val cents = loadCentroids(spark, root)
    val probes = emb.select(col("vec_id"), col("emb"),
      explode_outer(Similarity.kmeansProbesCol(
        Similarity.quantize(col("emb")), cents, nprobe)).as("cell"))
    val evalVecs = readVectors(spark, root)
      .select(col("vec_id").as("eval_id"), col("emb").as("eval_emb"),
        col("cell").cast("long").as("cell"))
    probes.hint("shuffle_hash")
      .join(evalVecs, Seq("cell"), "left")
      .withColumn("score",
        round(cosineSimilarity(col("emb"), col("eval_emb")), 4))
      .groupBy(col("vec_id"))
      .agg(max(col("score")).as("max_eval_cos"))
      .withColumn("contaminated",
        coalesce(col("max_eval_cos") >= threshold, lit(false)))
  }

  /** Index-HEALTH readout over the stored index — the "when to
    * retrain" gate a production ANN stack runs after sustained
    * [[append]]s: per-cell population, corpus share, and skew
    * (population ÷ the uniform expectation). Appends never move
    * centroids, so drifting ingest concentrates into few cells;
    * skew ≫ 1 on hot cells means probe candidate lists grow past
    * the ~250/cell design point and the operator should [[rebuild]]
    * (and [[Similarity.silhouette]] quantifies the separation loss).
    * One aggregation whose scan projects ONLY the partition column —
    * at 100 TB the counts come from parquet metadata-cheap cell
    * directories, never the vector payload. Ratios are engine-exact
    * ([[graft.functions.ExactRound.ratio]]).
    *
    * Alongside the SKEW readout (the [[rebuild]] trigger), the
    * readout carries the two COMPACT triggers: `n_deltas` — the
    * committed delta-dir count, which is exactly how many extra
    * roots every probe's file listing unions — and `n_files`, the
    * data-file count across base + deltas (per-cell open cost). Both
    * are bounded driver-side listings, constant per row.
    *
    * Output: (cell, n_vecs, share, skew, n_deltas, n_files) — 6-dp
    * ratios.
    */
  def indexStats(spark: SparkSession, path: String): DataFrame = {
    val root = resolveRoot(path)
    val nDeltas =
      AtomicCommit.committedDeltaIds(s"$root/vectors").size.toLong
    val nFiles = AtomicCommit.committedPaths(s"$root/vectors")
      .map(countDataFiles).sum
    val cells = readVectors(spark, root)
      .select(col("cell").cast("long").as("cell"))
    val g = cells.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val t = g.agg(sum(col("n_vecs")).as("tot"), count(lit(1)).as("k"))
    g.crossJoin(broadcast(t))
      .select(col("cell"), col("n_vecs"),
        graft.functions.ExactRound.ratio(col("n_vecs"), col("tot"), 6)
          .as("share"),
        graft.functions.ExactRound.ratio(col("n_vecs") * col("k"),
          col("tot"), 6).as("skew"),
        lit(nDeltas).as("n_deltas"), lit(nFiles).as("n_files"))
  }

  /** Parquet data files (part-*) under `root`, recursively — the
    * probe-side open count a compaction re-bounds.
    */
  private[datapipe] def countDataFiles(root: String): Long = {
    val s = Files.walk(Paths.get(root))
    try s.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("part-")).count()
    finally s.close()
  }

  /** Serve top-k from the STORED index: queries probe their `nprobe`
    * nearest cells by the stored centroids' exact objective
    * ([[Similarity.kmeansProbesCol]] — the same arithmetic the
    * trainer used, so stored-index results are row-identical to the
    * retrain path), the vectors scan is restricted to the probed
    * cells with a STATIC `isin` on the partition column (the probed
    * cell set is collected first — bounded by the cell count, never
    * by query count — so the restriction reaches the reader as
    * PartitionFilters: non-probed cells are never read), and the
    * survivors score exact cosine through the two-stage TopK heap.
    * No training job, no corpus-wide shuffle; per-query work is
    * nprobe · cell-population candidates. The query batch is
    * materialized once ([[localizeQueries]]) so the probed-cell set
    * and the join input are the same rows by construction.
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
            k: Int, nprobe: Int = 3): DataFrame =
    probeFiltered(spark, path, None, queries, k, nprobe)

  /** [[probe]] with a METADATA PRE-FILTER — the filtered-ANN serving
    * shape ([[Similarity.filteredTopK]] / `filteredPqTopK`) over the
    * STORED index: `allowed` (vec_id) restricts the candidate set
    * with a semi join BEFORE scoring, so the post-filter recall hole
    * (fetch k, then filter below k) cannot arise — every query still
    * sees k survivors from the allowed population of its probed
    * cells. The allowed side joins AFTER partition pruning: the scan
    * still reads only probed cells, and the semi join carries ids
    * only.
    */
  def probeFiltered(spark: SparkSession, path: String,
                    allowed: Option[DataFrame], queries: DataFrame,
                    k: Int, nprobe: Int = 3): DataFrame = {
    val root = resolveRoot(path)
    val cents = loadCentroids(spark, root)
    val q = localizeQueries(queries).select(col("q_id"),
      explode(Similarity.kmeansProbesCol(Similarity.quantize(col("q_emb")),
        cents, nprobe)).as("cell"),
      col("q_emb"))
    val probed = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0).toInt).toSeq
    // filter BEFORE the cast: the partition column materializes as
    // int (directory-name inference) and the pruning predicate must
    // sit on it directly
    val pruned = readVectors(spark, root)
      .filter(col("cell").isInCollection(probed))
      .withColumn("cell", col("cell").cast("long"))
    val vecs = allowed match {
      case Some(a) => pruned.join(a.select(col("vec_id")), Seq("vec_id"),
        "left_semi")
      case None => pruned
    }
    val scored = vecs.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score",
        round(cosineSimilarity(col("q_emb"), col("emb")), 4))
    Similarity.rankTopK(scored, k)
  }
}
