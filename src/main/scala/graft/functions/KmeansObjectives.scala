package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused per-cell k-means objective: for a quantized vector q and a
  * codebook of exact (component-sum, count) centroids, computes
  * f_c = D_c / n_c² with D_c = Σ_i (n_c·q_i − s_c_i)² for ALL cells
  * in one codegen loop.
  *
  * Why an Expression: the composed `array(cells.map(zip_with +
  * aggregate))` form allocates one intermediate array per (row, cell)
  * and evaluates boxed lambdas — with 8 PQ subspaces × 16 cells that
  * is 128 HOF evaluations per row, the same shape the engine already
  * fused away for shingles/minhash/hyperplanes. The arithmetic is
  * bit-identical to the composed form (exact integer D, one IEEE
  * division by the Scala-computed n·n double), which
  * KmeansObjectivesSpec pins — the sim_ivf_kmeans / sim_pq_topk
  * oracles replay exactly this math in SQL.
  */
case class KmeansObjectivesExpr(child: Expression,
                                sums: Seq[Seq[Long]],
                                counts: Seq[Long])
    extends UnaryExpression {

  require(sums.length == counts.length && sums.nonEmpty,
    "one (sums, count) pair per cell")
  require(sums.map(_.length).distinct.size == 1,
    "every cell's component-sum vector must have the same dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kmeans_objectives"

  @transient private lazy val sumsArr: Array[Array[Long]] =
    sums.map(_.toArray).toArray
  @transient private lazy val countsArr: Array[Long] = counts.toArray

  override def nullSafeEval(a: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val d = q.numElements()
    val k = countsArr.length
    if (d != sumsArr(0).length)
      throw new IllegalArgumentException(
        s"kmeans_objectives: vector dim $d != codebook dim ${sumsArr(0).length}" +
          " — a prefix-only objective would assign cells silently wrong")
    var j = 0
    while (j < d) {
      if (q.isNullAt(j))
        throw new IllegalArgumentException(
          s"kmeans_objectives: null component at index $j — scoring it " +
            "as 0 would assign cells silently wrong")
      j += 1
    }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val n = countsArr(c)
      val s = sumsArr(c)
      var big = 0L
      var i = 0
      while (i < d) {
        val diff = n * q.getLong(i) - s(i)
        big += diff * diff
        i += 1
      }
      out(c) = big.toDouble / (n.toDouble * n.toDouble)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sumsRef = ctx.addReferenceObj("sums", sumsArr, "long[][]")
    val countsRef = ctx.addReferenceObj("counts", countsArr, "long[]")
    nullSafeCodeGen(ctx, ev, q => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val big = ctx.freshName("big")
      val diff = ctx.freshName("diff")
      val out = ctx.freshName("out")
      s"""
        int $d = $q.numElements();
        if ($d != $sumsRef[0].length) {
          throw new IllegalArgumentException(
            "kmeans_objectives: vector dim " + $d + " != codebook dim " +
            $sumsRef[0].length);
        }
        for (int $i = 0; $i < $d; $i++) {
          if ($q.isNullAt($i)) {
            throw new IllegalArgumentException(
              "kmeans_objectives: null component at index " + $i);
          }
        }
        double[] $out = new double[$countsRef.length];
        for (int $c = 0; $c < $countsRef.length; $c++) {
          long $n = $countsRef[$c];
          long[] $s = $sumsRef[$c];
          long $big = 0L;
          for (int $i = 0; $i < $d; $i++) {
            long $diff = $n * $q.getLong($i) - $s[$i];
            $big += $diff * $diff;
          }
          $out[$c] = ((double) $big) / (((double) $n) * ((double) $n));
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): KmeansObjectivesExpr = copy(child = newChild)
}

object KmeansObjectives {
  /** kmeans_objectives(q): array<double> of f_c per codebook cell. */
  def of(q: Column, cents: Seq[(Array[Long], Long)]): Column =
    ColumnBridge.column(KmeansObjectivesExpr(
      ColumnBridge.expression(q.cast("array<long>")),
      cents.map(_._1.toSeq), cents.map(_._2)))
}
