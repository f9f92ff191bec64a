package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate every document's
  * token stream in document order and cut the stream every `capacity`
  * tokens ("concat-and-chunk" packing). Emits one row per (document,
  * chunk) overlap — a document that straddles a cut appears in each
  * chunk it touches, with its per-chunk token share — which is
  * exactly the bookkeeping a batch assembler needs to materialize
  * fixed-length training sequences.
  *
  * Scale design: the only global coordination is an EXCLUSIVE PREFIX
  * SUM of per-document token counts in id order. The naive
  * `sum(n) over (order by id)` window funnels every row through ONE
  * partition — the classic 100 TB killer — so this runs the textbook
  * two-pass distributed scan instead:
  *
  *  1. range-partition by id and sort within partitions (one
  *     shuffle; partition i holds strictly smaller ids than i+1);
  *  2. per-partition token totals — numPartitions longs — come back
  *     to the driver, whose running sum yields each partition's base
  *     offset;
  *  3. one narrow mapPartitions pass emits each row's global start
  *     offset from the partition base. The compact (id, n) rows are
  *     cached around the shuffle, so the feeding pipeline and the
  *     post-shuffle sort each run exactly once.
  *
  * Everything after the prefix sum is per-row arithmetic: a document
  * spanning [start, start+n) touches chunks floor(start/C) through
  * floor((start+n-1)/C), each with min(end,(b+1)C) - max(start,bC)
  * tokens. The explode fan-out is bounded by n/C + 1 per document.
  */
object Packing {

  /** One row per (doc, chunk) overlap: (doc_id, chunk_id, n_tokens).
    * Documents with zero tokens occupy no chunk and are dropped.
    */
  def packChunks(docs: DataFrame, idCol: Column, nTokensCol: Column,
                 capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Persist the compact (id, n) projection BEFORE the range
    // repartition: RangePartitioner runs an eager SAMPLING job over
    // its child to pick bounds, then the shuffle-map job runs the
    // child again — without the cache that is two full passes over
    // whatever pipeline feeds the packer (in the composed e2e entry,
    // joins over the document text). 16 bytes/row, spills to disk.
    val counted = docs
      .select(idCol.cast("long").as("id"), nTokensCol.cast("long").as("n"))
      .filter(col("n") > 0)
      .persist(lvl)
    // Persist the sorted partitions too: both the totals job and the
    // offset pass consume them, and the post-shuffle sort would
    // otherwise run in each.
    val sorted = counted
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
      .rdd.persist(lvl)
    val partTotals = sorted
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // The totals job materialized `sorted`; the cached (id, n) DF
    // behind it is no longer needed by anyone.
    counted.unpersist(false)
    // Exclusive scan over the (tiny) per-partition totals: base(i) =
    // sum of all tokens in partitions before i.
    val base = partTotals.scanLeft(0L)(_ + _)
    val withStart = sorted.mapPartitionsWithIndex { (i, it) =>
      var acc = base(i)
      it.map { case (id, n) =>
        val s = acc
        acc += n
        (id, n, s)
      }
    }
    spark.createDataFrame(withStart).toDF("doc_id", "n", "start")
      .select(col("doc_id"), col("n"), col("start"),
        explode(sequence(
          floor(col("start") / capacity).cast("long"),
          floor((col("start") + col("n") - 1) / capacity).cast("long")))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (least(col("start") + col("n"), (col("chunk_id") + 1) * capacity) -
          greatest(col("start"), col("chunk_id") * capacity)).as("n_tokens"))
  }
}
