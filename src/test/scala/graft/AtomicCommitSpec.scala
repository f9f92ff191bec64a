package graft

import java.nio.file.{Files, Paths}

import graft.datapipe.AtomicCommit

/** Protocol-level contracts of the staged-commit machinery the
  * stored indexes build on — pinned directly, independent of any
  * index semantics.
  */
class AtomicCommitSpec extends SparkSpec {

  import spark.implicits._

  test("committedPaths: base first, then committed deltas in name " +
    "order; _SUCCESS-less and staging dirs never listed") {
    val root = Files.createTempDirectory("graft_ac_paths").toString
    val target = s"$root/t"
    Seq(1L).toDF("a").write.parquet(target)
    AtomicCommit.commitAppend(target, Some("b-delta")) { st =>
      Seq(2L).toDF("a").write.parquet(st) }
    AtomicCommit.commitAppend(target, Some("a-delta")) { st =>
      Seq(3L).toDF("a").write.parquet(st) }
    // a torn dir (no _SUCCESS) planted where deltas live
    val torn = Paths.get(s"$target.deltas/c-torn")
    Files.createDirectories(torn)
    val got = AtomicCommit.committedPaths(target)
    assert(got === Seq(target, s"$target.deltas/a-delta",
      s"$target.deltas/b-delta"))
    assert(AtomicCommit.read(spark, target).as[Long].collect().sorted
      === Array(1L, 2L, 3L))
  }

  test("commitId validation rejects path-escaping ids") {
    val root = Files.createTempDirectory("graft_ac_ids").toString
    val target = s"$root/t"
    Seq(1L).toDF("a").write.parquet(target)
    for (bad <- Seq("", "a/b", "..", ".", "a\\b")) {
      val e = intercept[IllegalArgumentException] {
        AtomicCommit.commitAppend(target, Some(bad)) { st =>
          Seq(2L).toDF("a").write.parquet(st) }
      }
      assert(e.getMessage.contains("commitId"), s"id '$bad': $e")
    }
    assert(AtomicCommit.read(spark, target).count() === 1,
      "no rejected id may have published anything")
  }

  test("a write that skips _SUCCESS is refused at commit time and " +
    "publishes nothing") {
    val root = Files.createTempDirectory("graft_ac_nosucc").toString
    val target = s"$root/t"
    Seq(1L).toDF("a").write.parquet(target)
    intercept[IllegalArgumentException] {
      AtomicCommit.commitAppend(target) { st =>
        // a bare file dump, not a completed Spark write
        Files.createDirectories(Paths.get(st))
        Files.write(Paths.get(st, "part-00000"), Array[Byte](1))
      }
    }
    assert(AtomicCommit.committedPaths(target) === Seq(target))
  }

  test("version machinery: resolveVersionRoot follows the MANIFEST, " +
    "nextVersion counts past every existing v<n>") {
    val root = Files.createTempDirectory("graft_ac_ver").toString
    assert(AtomicCommit.resolveVersionRoot(root) === root, "flat = self")
    assert(AtomicCommit.nextVersion(root) === "v1")
    Files.createDirectories(Paths.get(root, "v3"))
    assert(AtomicCommit.nextVersion(root) === "v4",
      "gaps don't confuse the counter")
    AtomicCommit.writeManifest(Paths.get(root, "MANIFEST"), "v3")
    assert(AtomicCommit.resolveVersionRoot(root) === s"$root/v3")
    AtomicCommit.writeManifest(Paths.get(root, "MANIFEST"), "v4")
    assert(AtomicCommit.resolveVersionRoot(root) === s"$root/v4",
      "the manifest swap repoints atomically (REPLACE_EXISTING)")
  }
}
