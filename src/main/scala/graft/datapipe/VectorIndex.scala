package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSimilarity

/** MATERIALIZED IVF index lifecycle — the vector sibling of the
  * minhash recrawl loop ([[Dedup.minhashIndexTable]] /
  * `minhashProbePrebuilt` / `minhashIndexAppend`): a production ANN
  * stack trains its coarse quantizer ONCE, persists (centroids,
  * cell-partitioned vectors) as parquet, answers every query batch
  * from the stored index, and folds new vectors in delta-sized —
  * re-training per query run (what [[Similarity.ivfTopKKmeans]]
  * necessarily does as a self-contained query) re-pays the whole
  * trainer at every probe and is the shape no serving system ships.
  *
  * On disk:
  *  - `<path>/centroids`: (cell, s array<long>, n long) — the exact
  *    integer (component-sum, count) pairs [[Similarity.
  *    kmeansCentroids]] trains (never divided, so the parquet
  *    roundtrip is bit-exact and any engine replays the same
  *    assignment arithmetic from the stored rows).
  *  - `<path>/vectors`: (vec_id, emb) PARTITIONED BY cell — the
  *    100 TB layout every IVF scaladoc in [[Similarity]] points at:
  *    the probe's cell restriction becomes scan-level PARTITION
  *    pruning (non-probed cells are never read, `PartitionFilters`
  *    in the scan node), not a post-scan filter.
  *
  * [[probe]] is row-identical to the retrain path
  * (`ivfTopKKmeans(emb, q, k, cells, iters, nprobe)` — VectorIndexSpec
  * pins it) but runs ZERO training jobs: centroids come back as one
  * bounded driver read (cells·dim longs, ≤ 4096·dim by the
  * [[Similarity.autoCells]] clamp), and the only corpus touch is the
  * pruned scan of the probed cells. [[append]] assigns the delta with
  * the STORED centroids (one delta-sized projection) and
  * parquet-appends into the cell partitions — no corpus rewrite, no
  * retrain, exactly the minhash append contract. Centroid drift under
  * sustained appends is the operator's documented re-train trigger
  * (rebuild when cell-population skew degrades recall — the readout
  * [[Similarity.silhouette]] exists for).
  */
object VectorIndex {

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

  /** The stored coarse quantizer, cell-ordered — bounded driver
    * state (cells·dim longs, the same rows every Lloyd's round
    * already ships).
    */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Array[Long], Long)] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids").orderBy(col("cell"))
      .select(col("s"), col("n")).as[(Seq[Long], Long)]
      .collect().map { case (s, n) => (s.toArray, n) }.toSeq
  }

  /** Fold `delta` (vec_id, emb) into the stored index WITHOUT
    * retraining: assign each delta vector with the stored centroids
    * (one codegen projection over the delta only) and parquet-append
    * into the cell partitions. Cost is delta-assign + delta-write,
    * independent of the standing index size.
    */
  def append(spark: SparkSession, path: String, delta: DataFrame): Unit = {
    val cents = loadCentroids(spark, path)
    delta.select(col("vec_id"), col("emb"),
        Similarity.kmeansAssignCol(Similarity.quantize(col("emb")),
          cents).as("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/vectors")
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
    * nprobe · cell-population candidates.
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
            k: Int, nprobe: Int = 3): DataFrame = {
    val cents = loadCentroids(spark, path)
    val q = queries.select(col("q_id"),
      explode(Similarity.kmeansProbesCol(Similarity.quantize(col("q_emb")),
        cents, nprobe)).as("cell"),
      col("q_emb"))
    val probed = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0).toInt).toSeq
    // filter BEFORE the cast: the partition column materializes as
    // int (directory-name inference) and the pruning predicate must
    // sit on it directly
    val vecs = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isInCollection(probed))
      .withColumn("cell", col("cell").cast("long"))
    val scored = vecs.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score",
        round(cosineSimilarity(col("q_emb"), col("emb")), 4))
    Similarity.rankTopK(scored, k)
  }
}
