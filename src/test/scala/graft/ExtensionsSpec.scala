package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimHashFunctions, VectorFunctions}

/** The SQL surface of the native expressions: registered via
  * GraftExtensions, results identical to the Column API.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_similarity is callable from SQL and matches the Column API") {
    val viaSql = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 2.0D, 3.0D), array(3.0D, 2.0D, 1.0D))")
      .as[Double].head()
    val viaColumn = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0)))
      .toDF("a", "b")
      .select(VectorFunctions.cosineSimilarity(col("a"), col("b")))
      .as[Double].head()
    assert(viaSql === viaColumn)
    assert(math.abs(viaSql - 10.0 / 14.0) < 1e-12)
  }

  test("minhash_signature is callable from SQL and matches the Column API") {
    val viaSql = spark.sql("SELECT minhash_signature(array(7L, 8L, 9L), 8)")
      .as[Seq[Long]].head()
    val viaColumn = Seq(Seq(7L, 8L, 9L)).toDF("hh")
      .select(graft.functions.MinHashFunctions.minhashSignature(col("hh"), 8))
      .as[Seq[Long]].head()
    assert(viaSql === viaColumn && viaSql.length === 8)
  }

  test("shingle_hashes is callable from SQL and matches the Column API") {
    val viaSql = spark.sql(
      "SELECT shingle_hashes(array('a', 'b', 'c', 'd'), 3)")
      .as[Seq[Long]].head()
    val viaColumn = Seq(Seq("a", "b", "c", "d")).toDF("toks")
      .select(graft.functions.ShingleHashes.ofTokens(col("toks"), 3))
      .as[Seq[Long]].head()
    assert(viaSql === viaColumn && viaSql.length === 2)
  }

  test("simhash64 is callable from SQL and matches the Column API") {
    val hashes = Seq(Seq(7L, 7L, 8L))
    val viaSql = spark.sql("SELECT simhash64(array(7L, 7L, 8L))")
      .as[Long].head()
    val viaColumn = hashes.toDF("hh")
      .select(SimHashFunctions.simhash64(col("hh"))).as[Long].head()
    assert(viaSql === viaColumn)
  }

  test("pack_signed_bytes + byte_dot_product are callable from SQL") {
    val viaSql = spark.sql(
      """SELECT byte_dot_product(pack_signed_bytes(array(1L, -2L, 127L)),
        |                        pack_signed_bytes(array(3L, 4L, -1L)))""".stripMargin)
      .as[Long].head()
    assert(viaSql === (1 * 3 + -2 * 4 + 127 * -1).toLong)
    // SQL's default array(1,2,3) is array<int>: the registration must
    // cast to long slots, not read 8 bytes across two int slots
    val viaIntLits = spark.sql(
      "SELECT byte_dot_product(pack_signed_bytes(array(1, 2, 3)), " +
        "pack_signed_bytes(array(4, 5, 6)))").as[Long].head()
    assert(viaIntLits === (4 + 10 + 18).toLong)
  }

  test("hyperplane_bits is callable from SQL and matches the Column API") {
    val emb = Seq(Seq(0.5, -1.5, 2.0))
    val viaSql = spark.sql(
      "SELECT hyperplane_bits(array(0.5D, -1.5D, 2.0D), 16)")
      .as[Seq[Boolean]].head()
    val viaColumn = emb.toDF("emb")
      .select(graft.functions.HyperplaneFunctions.hyperplaneBits(col("emb"), 16))
      .as[Seq[Boolean]].head()
    assert(viaSql === viaColumn && viaSql.length === 16)
  }

  test("winnow_select is callable from SQL and matches the Column API") {
    val viaSql = spark.sql(
      "SELECT winnow_select(array(9, 2, 5, 7, 1, 8), 4)")
      .as[Seq[Long]].head()
    val viaColumn = Seq(Seq(9L, 2L, 5L, 7L, 1L, 8L)).toDF("hs")
      .select(graft.functions.WinnowSelect.of(col("hs"), 4))
      .as[Seq[Long]].head()
    assert(viaSql === viaColumn && viaSql === Seq(2L, 1L))
  }
}
