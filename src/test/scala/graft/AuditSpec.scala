package graft

import graft.datapipe.Audit

import org.apache.spark.sql.functions._

/** Canary injection/exposure audit: injection determinism, the
  * exposure counts on a hand-built corpus with a leak, and the
  * lost-canary failure mode the audit exists to catch.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("canaryInject appends the origin canary at id % k == 0 and the " +
    "leaked copy at id = origin + offset, as a pure per-row function") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"),
      (3L, "delta"), (4L, "epsilon")).toDF("doc_id", "text")
    val out = Audit.canaryInject(docs, "doc_id", "text",
      everyK = 2, leakOffset = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2))).toMap
    val c0 = s"canary_${md5Hex("0")}"
    val c2 = s"canary_${md5Hex("2")}"
    val c4 = s"canary_${md5Hex("4")}"
    assert(out(0L) === (s"alpha $c0", true))
    assert(out(1L) === ("beta", false))
    assert(out(2L) === (s"gamma $c2", true))
    // id 3 hosts the leak of origin 0 (3 - 3 = 0, even)
    assert(out(3L) === (s"delta $c0", false))
    // id 4 hosts its own canary; 4 - 3 = 1 is odd, no leak
    assert(out(4L) === (s"epsilon $c4", true))
  }

  test("canaryExposure counts leaked canaries as 2, intact as 1, and " +
    "flags a canary dedup dropped as not found at origin") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"),
      (3L, "delta"), (4L, "epsilon")).toDF("doc_id", "text")
    val injected = Audit.canaryInject(docs, "doc_id", "text",
      everyK = 2, leakOffset = 3L)
    val out = Audit.canaryExposure(injected, "doc_id", "text", everyK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_found"), r.getAs[Boolean]("found_origin"),
          r.getAs[Boolean]("leaked"))).toMap
    assert(out.keySet === Set(0L, 2L, 4L))
    assert(out(0L) === ((2L, true, true)), "origin 0 leaked into doc 3")
    assert(out(2L) === ((1L, true, false)))
    assert(out(4L) === ((1L, true, false)))

    // simulate dedup dropping origin 2's text: the audit must read
    // n_found 0 / found_origin false for it, others unchanged
    val lost = injected.withColumn("text",
      when(col("doc_id") === 2L, lit("gamma")).otherwise(col("text")))
    val after = Audit.canaryExposure(lost, "doc_id", "text", everyK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_found"), r.getAs[Boolean]("found_origin"))).toMap
    assert(after(2L) === ((0L, false)))
    assert(after(0L) === ((2L, true)))
  }

  test("the fixture audit finds every planted canary exactly where the " +
    "id arithmetic says it should be") {
    val rows = SparkEntry.queries("canary_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).as[Long].collect().toSet
    for (r <- rows) {
      val origin = r.getAs[Long]("origin_id")
      val expected = if (ids.contains(origin + 417L)) 2L else 1L
      assert(r.getAs[Long]("n_found") === expected, s"origin $origin")
      assert(r.getAs[Boolean]("found_origin"))
      assert(r.getAs[Boolean]("leaked") === (expected > 1L))
    }
  }
}
