package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Multimodal

/** Multimodal plumbing: the binary round-trips the stubs cannot fake —
  * frame reassembly, resize cropping, and feature determinism.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text")).limit(50)

  test("frame sampling partitions every payload byte exactly once") {
    val frames = Multimodal.frameSample(spark, docs, 128)
    val reassembled = frames
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("frame_idx"), col("frame"))))
        .as("fs"))
      .select(col("doc_id"),
        aggregate(col("fs"), lit(Array.empty[Byte]),
          (acc, f) => concat(acc, f.getField("frame"))).as("bytes"))
    val original = docs.select(col("doc_id"), col("text").cast("binary").as("bytes"))
    val joined = reassembled.as("r")
      .join(original.as("o"), Seq("doc_id"))
      .filter(col("r.bytes") =!= col("o.bytes"))
    assert(joined.count() === 0)
  }

  test("resize crops to exactly w*h bytes (or payload size if smaller)") {
    val resized = Multimodal.resize(spark, docs, 16, 16)
      .select(col("doc_id"), octet_length(col("resized")).as("out"))
    val expected = docs.select(col("doc_id"),
      least(octet_length(col("text").cast("binary")), lit(256)).as("exp"))
    assert(resized.join(expected, Seq("doc_id"))
      .filter(col("out") =!= col("exp")).count() === 0)
  }

  test("feature extraction is deterministic and unit-range") {
    val f1 = Multimodal.extractFeatures(spark, docs).collect().toSet
    val f2 = Multimodal.extractFeatures(spark, docs).collect().toSet
    assert(f1 === f2)
    val bad = Multimodal.extractFeatures(spark, docs)
      .filter(col("f0") < 0 || col("f0") >= 1 || col("f3") < 0 || col("f3") >= 1)
    assert(bad.count() === 0)
  }
}
