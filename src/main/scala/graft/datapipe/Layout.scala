package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering,
  * the lakehouse file-skipping workhorse (Morton 1966; the same
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`). Interleaving
  * the bits of several bucketed columns gives a single sort key under
  * which rows close in EVERY dimension land close in the file order,
  * so per-file min/max statistics prune multi-predicate scans that a
  * single-column sort can only prune on its leading column — at
  * 100 TB the difference between reading one file group and reading
  * the table.
  *
  * Honest scope: production z-ordering buckets each column by RANGE-
  * PARTITION (quantile) boundaries so skewed columns still spread
  * evenly; here the bucketing is corpus min/max LINEAR binning, which
  * makes the whole key an exactly-replayable integer contract (the
  * binning seam is the place a quantile variant plugs in — the
  * interleave below is unchanged).
  *
  * Scale shape: ONE tiny min/max aggregation (broadcast back as a
  * single row), then the bucket + interleave is a pure per-row
  * codegen'd integer expression — zero extra shuffles to COMPUTE the
  * key; [[zOrderRepartition]] spends the one range-exchange that
  * actually lays the data out. Portability: the scale chain is a
  * fixed IEEE expression (identical per-row doubles in any engine)
  * and everything after the floor is integer-exact.
  */
object Layout {

  /** Append per-column bucket ids (`<name>_bucket` ∈ [0, 2^bits)) and
    * the interleaved `zkey`. Bit b of column i lands at position
    * b·n + i, so the high bits of the key are the coarse quadrant
    * address — the property the locality spec pins.
    *
    * NULL/NaN contract (pinned in LayoutSpec): a NULL or NaN value
    * buckets to 0 — every row gets a NON-NULL zkey, so no silent
    * everything-in-one-range-partition collapse, and an oracle
    * replays the rule as `COALESCE` + a NaN guard. NaN is also
    * excluded from the min/max scale statistics (Spark sorts NaN
    * above +Inf, other engines differ — keeping it out of the stats
    * keeps the scale chain engine-portable).
    */
  def zOrderKey(df: DataFrame, cols: Seq[(Column, String)],
                bits: Int = 8): DataFrame = {
    val n = cols.size
    require(n >= 1 && bits >= 1 && bits * n <= 62,
      "need 1+ columns and bits*cols <= 62 to fit a signed long")
    val maxBucket = (1L << bits) - 1
    val aggs = cols.zipWithIndex.flatMap { case ((c, _), i) =>
      val cd = c.cast("double")
      val finite = when(!isnan(cd), cd) // NULL otherwise; min/max skip
      Seq(min(finite).as(s"__mn$i"), max(finite).as(s"__mx$i")) }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withU = cols.zipWithIndex.foldLeft(df.crossJoin(broadcast(stats))) {
      case (acc, ((c, name), i)) =>
        val mn = col(s"__mn$i"); val mx = col(s"__mx$i")
        val cd = c.cast("double")
        acc.withColumn(s"${name}_bucket",
          when(cd.isNull || isnan(cd), lit(0L))
            .when(mx === mn, lit(0L)).otherwise(
              least(lit(maxBucket), greatest(lit(0L),
                floor((cd - mn) / (mx - mn) * lit(maxBucket.toDouble))))))
    }
    val z = (0 until bits).foldLeft(lit(0L)) { (accB, b) =>
      cols.zipWithIndex.foldLeft(accB) { case (a2, ((_, name), i)) =>
        a2 + shiftright(col(s"${name}_bucket"), b).bitwiseAND(lit(1L)) *
          lit(1L << (b * n + i))
      }
    }
    withU.withColumn("zkey", z)
      .drop((0 until n).flatMap(i => Seq(s"__mn$i", s"__mx$i")): _*)
  }

  /** The layout action: range-exchange on the z-key and sort within
    * partitions, so a downstream `write` emits files whose per-file
    * min/max are tight in EVERY interleaved dimension. This is the
    * operator's only shuffle.
    */
  def zOrderRepartition(df: DataFrame, cols: Seq[(Column, String)],
                        numPartitions: Int, bits: Int = 8): DataFrame =
    zOrderKey(df, cols, bits)
      .repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))

  /** The shard writeout sink: materialize a training corpus as one
    * parquet directory per shard (`<shardCol>=<id>/`), each shard's
    * rows sorted by `sortCols` (the epoch order key) so a data-loader
    * worker streams its shard in training order with zero seeks.
    * Feed [[ShuffleOrder.shardAssign]]'s output (joined back to the
    * payload on doc_id) with sortCols = global_start.
    *
    * Scale shape: ONE hash exchange on the shard id, then a
    * partition-local sort — no global sort, and `partitionBy` emits
    * exactly one file per (shard, task) pair; because the exchange
    * keys on the shard id, that is one file per shard. A hot shard
    * cannot arise by construction (shardAssign bounds every shard's
    * mass within one document of total/S).
    */
  def writeSharded(df: DataFrame, path: String, shardCol: String,
                   sortCols: Seq[Column]): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol) +: sortCols: _*)
      .write.partitionBy(shardCol).mode("overwrite").parquet(path)

  /** Small-file compaction planner (the `OPTIMIZE`/bin-packing half
    * of table maintenance): given a file manifest (partition, file
    * id, bytes), assign files to compaction bins by SEQUENTIAL FILL
    * — walk the files of each partition in id order and start a new
    * bin each time `targetBytes` of cumulative input has been
    * consumed. A file belongs to the bin its START offset falls in
    * (`bin = floor(exclusive_cumsum / target)`), so the rule is a
    * pure prefix-sum function of the manifest: bins can overflow by
    * at most one file, never underfill below target except the last
    * bin of a partition, and a single file ≥ target gets a bin of
    * its own plus the overflow documented above. At 100 TB this is
    * the planner that turns a million 10 MB files into 10 GB
    * read-optimized groups; emitting the PLAN (not rewriting data)
    * keeps it a metadata-sized query.
    *
    * Scale shape: one window prefix sum PER PARTITION KEY (no global
    * ordering — partitions plan independently and in parallel), then
    * a bounded groupBy on (partition, bin). The manifest is metadata
    * (one row per file), orders of magnitude smaller than the data
    * it describes.
    *
    * Output: (partCol, bin_id, n_files, bin_bytes, first_file,
    * last_file) — `first_file`/`last_file` are the id range the
    * compactor rewrites together.
    */
  def compactionPlan(manifest: DataFrame, partCol: String,
                     fileIdCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileIdCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .select(col(partCol), col(fileIdCol), col(bytesCol).cast("bigint")
        .as("__bytes"))
      .withColumn("__start",
        coalesce(sum(col("__bytes")).over(w), lit(0L)))
      // `div`, not `/`: Spark's / is IEEE double division, which
      // rounds above 2^53 — a real risk on cumulative BYTE offsets
      .withColumn("bin_id", expr(s"__start div ${targetBytes}L"))
      .groupBy(col(partCol), col("bin_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("__bytes")).as("bin_bytes"),
        min(col(fileIdCol)).as("first_file"),
        max(col(fileIdCol)).as("last_file"))
  }
}
