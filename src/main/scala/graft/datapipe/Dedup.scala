package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (the design constraint is 100 TB of documents):
  *  - exact dedup is one hash-shuffle on a 16-byte key — the md5 is
  *    computed map-side so the shuffle carries (hash, id), never the
  *    document body;
  *  - minhash/LSH banding turns all-pairs similarity into an
  *    equi-join on (band, band-signature) buckets, i.e. a shuffle on
  *    a small key with candidate verification only inside buckets;
  *  - simhash reduces a document to one 64-bit code; near-dup
  *    candidates share a code under bit-sampling.
  */
object Dedup {

  /** Exact dedup groups: content hash → keeper id + group size.
    * The survivor list is `filter(n_dups === 1 || doc_id === keeper)`.
    */
  def exactGroups(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(md5(TextAnalysis.normalize(text)).as("content_hash"))
      .agg(min(id).as("keeper_doc_id"), count(lit(1)).as("n_dups"))

  /** Word k-shingles of the normalized text, distinct per document.
    * Pure column ops: split → sliding window via transform over an
    * index sequence → distinct.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(TextAnalysis.normalize(text), " ")
    array_distinct(
      when(size(toks) < k, array(array_join(toks, " ")))
        .otherwise(transform(
          sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + lit(1), lit(k)), " "))))
  }

  /** MinHash signature: for each of `numHashes` permutations i,
    * min over shingles of xxhash64(shingle, seed=i). One value per
    * permutation — computed with codegen'd builtins (xxhash64 +
    * array transform + array_min), no UDF.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band buckets: signature split into `bands` rows of
    * `rowsPerBand`, each hashed to a bucket key. Documents sharing
    * any (band, bucket) are candidate pairs.
    */
  def lshBuckets(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sigCol, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)

  /** MinHash+LSH near-duplicate pairs with verified Jaccard >=
    * `threshold`. Returns (a_id, b_id, jaccard). The self-join runs
    * on the exploded (band, bucket) key — the only shuffle is on that
    * key, and verification explodes only within buckets.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.8): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("id"), shingles(col(textCol), 3).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val buckets = withSig
      .select(col("id"), col("sh"),
        explode(lshBuckets(col("sig"), bands, numHashes / bands)).as("bb"))
    val a = buckets.select(col("bb"), col("id").as("a_id"), col("sh").as("a_sh"))
    val b = buckets.select(col("bb"), col("id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("bb"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: 64-bit locality-sensitive code over word shingles.
    * For each bit position, sum +1/-1 votes from each shingle's
    * xxhash64; bit = 1 when the vote is positive. Expressed with
    * aggregate() over the shingle array — still no UDF.
    */
  def simhash(shingleCol: Column): Column = {
    val bits = (0 until 64).map { bit =>
      val votes = aggregate(shingleCol, lit(0L),
        (acc, s) => acc + when(
          shiftright(xxhash64(s), bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Exact-Jaccard n-gram near-dup pairs via inverted index join:
    * explode distinct shingles, self-join on shingle, count common,
    * Jaccard from per-doc distinct counts. Quadratic only within
    * shingle posting lists (i.e. the shuffle key is the shingle).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), k)).as("shingle"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("x").join(sh.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("id").as("a_id"), col("n_sh").as("a_n")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("n_sh").as("b_n")), "b_id")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("a_n") + col("b_n") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("n_common"), col("jaccard"))
  }
}
