package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.PromHistogram
import graft.ops.EnvelopeOps

/** The SURVEY §5.3 property invariants that need a SparkSession
  * (PropertySpec holds the pure-JVM ones): scalacheck-generated
  * inputs are batched into DataFrames and the invariant is asserted
  * over every row, so each test is a property check at DataFrame
  * granularity rather than one hand-picked example.
  */
class SparkPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sampleN[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("normalize ∘ denormalize is identity on generated credentials") {
    val creds = sampleN(PropertySpec.genCredential, 60)
    val df = creds.toDS().select(struct(col("*")).as("cred"))
    val back = df.select(col("cred"),
      EnvelopeOps.normalizeContext(
        EnvelopeOps.denormalizeContext(col("cred"))).as("back"))
    // field-by-field: the rename shifts field ORDER, which JSON-object
    // semantics don't observe, so whole-struct equality would be wrong
    val bad = back.filter(!(
      col("back.context") === col("cred.context") &&
        col("back.id") === col("cred.id") &&
        col("back.issuanceDate") === col("cred.issuanceDate") &&
        col("back.issuer") === col("cred.issuer") &&
        col("back.credentialSubject") === col("cred.credentialSubject") &&
        col("back.proof") === col("cred.proof") &&
        col("back.type") === col("cred.type")))
    assert(bad.isEmpty)
  }

  test("cumulative histogram counts are monotone and end at the total") {
    val buckets = Array(0.0, 1.0, 10.0, 100.0)
    val labels = Array("0", "1", "10", "100", "+Inf")
    val values = sampleN(Gen.chooseNum(-1e6, 1e6), 500) ++
      Seq(0.0, 1.0, 10.0, 100.0, -1e9, 1e9) // bucket edges + outliers
    val out = values.toDF("v")
      .select(PromHistogram.column(buckets, labels, col("v")).as("h"))
      .as[Seq[(String, Long)]].head()
    val counts = out.map(_._2)
    assert(out.map(_._1) === labels.toSeq)
    assert(counts.zip(counts.tail).forall { case (a, b) => a <= b },
      s"cumulative counts must be monotone: $counts")
    assert(counts.last === values.length.toLong,
      "+Inf bucket must equal the total count")
  }

  test("broadcast-join misses are exactly the symbols outside the dim") {
    val symGen = Gen.oneOf((1 to 40).map(i => s"SYM$i"))
    val dimSyms = sampleN(symGen, 25).distinct
    val eventSyms = sampleN(symGen, 300)
    val events = eventSyms.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("event_id", "symbol")
    val dim = dimSyms.map(s => (s, s"cred-$s")).toDF("symbol", "credential")
    val misses = events.join(broadcast(dim), Seq("symbol"), "left_anti")
      .select("symbol").distinct().as[String].collect().toSet
    assert(misses === eventSyms.toSet.diff(dimSyms.toSet))
  }
}
