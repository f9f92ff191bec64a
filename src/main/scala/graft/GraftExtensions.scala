package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ByteDotProduct, CosineSimilarity, HyperplaneBitsExpr, MinHashSignature, PackSignedBytes, ShingleHashes, SimHash64, WinnowSelect}

/** SparkSessionExtensions hook: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get the same
  * fused-codegen operators as the Column API — set
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def literalInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a literal int, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_similarity(a, b)")
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "simhash64(hashes)")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "minhash_signature(hashes, numHashes) — numHashes a literal int")
        MinHashSignature(children.head, literalInt(children(1), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "shingle_hashes(tokens, k) — k a literal int")
        ShingleHashes(children.head, literalInt(children(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pack_signed_bytes"),
      new ExpressionInfo(classOf[PackSignedBytes].getName, "pack_signed_bytes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "pack_signed_bytes(arr)")
        // cast like the Column API does: the expression reads LONG
        // array slots, and SQL's array(1,2,3) is array<int> — raw
        // children would read 8 bytes across two 4-byte slots
        PackSignedBytes(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("byte_dot_product"),
      new ExpressionInfo(classOf[ByteDotProduct].getName, "byte_dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "byte_dot_product(a, b)")
        ByteDotProduct(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(0), org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(1), org.apache.spark.sql.types.BinaryType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "winnow_select(hashes, window) — window a literal int")
        // cast like pack_signed_bytes: SQL array(1,2,3) is array<int>
        WinnowSelect(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
          literalInt(children(1), "window"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_bits"),
      new ExpressionInfo(classOf[HyperplaneBitsExpr].getName, "hyperplane_bits"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "hyperplane_bits(emb, bits) — bits a literal int")
        HyperplaneBitsExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children.head,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)),
          literalInt(children(1), "bits"))
      }))
  }
}
