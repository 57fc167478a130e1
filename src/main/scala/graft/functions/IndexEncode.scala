package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Single-expression ANN index encoders.
  *
  * Why these exist: the column-algebra encoders (128 PQ score columns +
  * 8 argmin when-chains; 16 IVF score columns + two argmin/mask layers)
  * are correct and codegen'd, but their PLANS are enormous — and a
  * Lloyd's training loop re-plans one per iteration. Round 14 measured
  * the per-job Catalyst overhead (analysis + optimization + codegen
  * bookkeeping over the wide trees) at ~0.3-0.4 s per iteration with the
  * DATA work near-zero: the training family's bench cost was plan
  * handling, not arithmetic. Each encoder is now ONE expression whose
  * loop does the identical double arithmetic in the identical order —
  * scores s_j = ‖c_j‖² − 2·⟨x, c_j⟩ with the left-fold dot, argmin ties
  * to the smallest index — so every code and cell assignment is
  * bit-identical to the column form the SQL oracle replays.
  *
  * The geometry (centroids / codebook + their precomputed norms) rides
  * in a content-hashed wrapper: codegen receives it via the references
  * array (source text identical across geometries — one janino compile
  * serves every training iteration), while equals/hashCode/toString stay
  * value-based and JVM-stable so plan canonicalization, memo keys and
  * the plan-digest lock never see an identity hash.
  */
final class PqGeometry(val cb: Array[Array[Array[Float]]],
    val norms: Array[Array[Double]]) extends Serializable {
  private val contentHash: Int =
    31 * java.util.Arrays.deepHashCode(cb.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.deepHashCode(norms.asInstanceOf[Array[AnyRef]])
  override def hashCode: Int = contentHash
  override def equals(o: Any): Boolean = o match {
    case g: PqGeometry =>
      java.util.Arrays.deepEquals(cb.asInstanceOf[Array[AnyRef]],
        g.cb.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(norms.asInstanceOf[Array[AnyRef]],
          g.norms.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def toString: String = s"PqGeometry(${contentHash.toHexString})"
}

final class CellGeometry(val cents: Array[Array[Float]],
    val norms: Array[Double]) extends Serializable {
  private val contentHash: Int =
    31 * java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.hashCode(norms)
  override def hashCode: Int = contentHash
  override def equals(o: Any): Boolean = o match {
    case g: CellGeometry =>
      java.util.Arrays.deepEquals(cents.asInstanceOf[Array[AnyRef]],
        g.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(norms, g.norms)
    case _ => false
  }
  override def toString: String = s"CellGeometry(${contentHash.toHexString})"
}

object IndexEncodeUtil {
  /** PQ codes: per subspace m, argmin_j ‖c_{m,j}‖² − 2·⟨x_m, c_{m,j}⟩,
    * left-fold dot in double, ties to the smallest j — identical to the
    * least()+when-chain column form.
    */
  def pqCodes(x: ArrayData, g: PqGeometry): ArrayData = {
    val nSub = g.cb.length
    val out = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      val cents = g.cb(m)
      val norms = g.norms(m)
      // truncate to the available elements like the old slice()+dot column
      // form did, so a malformed/short embedding encodes degenerately
      // instead of throwing (r14 advice)
      val avail = x.numElements() - m * 8
      var bestJ = 0
      var bestS = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val w = cents(j)
        var acc = 0.0
        val lim = if (w.length <= avail) w.length else math.max(avail, 0)
        var i = 0
        while (i < lim) {
          acc += x.getFloat(m * 8 + i).toDouble * w(i).toDouble
          i += 1
        }
        val s = norms(j) - 2.0 * acc
        if (s < bestS) { bestS = s; bestJ = j }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Nearest + second-nearest cell, replaying the two-layer column form
    * exactly: cell = first argmin; every score EQUAL to the minimum is
    * masked to Double.MaxValue; cell2 = first index attaining the masked
    * minimum (so an all-tied row yields cell2 = 0, as the when-chain
    * did). NaN embedding values are out of contract (r14 advice): Java
    * ==/< order NaN differently from Spark's === (which treats NaN=NaN
    * as true), so an all-NaN row yields cell=-1 here where the column
    * form yielded 0 — no producer in this repo emits NaN embeddings
    * (TESTDATA floats are finite), and the trained/fixed geometry paths
    * both gate on finite inputs upstream.
    */
  def cells(x: ArrayData, g: CellGeometry): ArrayData = {
    val n = g.cents.length
    val scores = new Array[Double](n)
    var best = Double.MaxValue
    var k = 0
    while (k < n) {
      val w = g.cents(k)
      var acc = 0.0
      var i = 0
      while (i < w.length) {
        acc += x.getFloat(i).toDouble * w(i).toDouble
        i += 1
      }
      val s = g.norms(k) - 2.0 * acc
      scores(k) = s
      if (s < best) best = s
      k += 1
    }
    var cell = -1
    var cell2 = -1
    var best2 = Double.MaxValue
    k = 0
    while (k < n) {
      if (scores(k) == best) { if (cell < 0) cell = k }
      else if (scores(k) < best2) best2 = scores(k)
      k += 1
    }
    // masked minimum: Double.MaxValue when every score tied the best
    val m2 = if (best2 == Double.MaxValue) Double.MaxValue else best2
    k = 0
    while (k < n && cell2 < 0) {
      val masked = if (scores(k) == best) Double.MaxValue else scores(k)
      if (masked == m2) cell2 = k
      k += 1
    }
    new GenericArrayData(Array(cell, cell2))
  }
}

case class PqEncodeExpr(child: Expression, geometry: PqGeometry)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(x: Any): Any =
    IndexEncodeUtil.pqCodes(x.asInstanceOf[ArrayData], geometry)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqGeometry", geometry,
      classOf[PqGeometry].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IndexEncodeUtil.pqCodes($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CellAssignExpr(child: Expression, geometry: CellGeometry)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cell_assign"

  override protected def nullSafeEval(x: Any): Any =
    IndexEncodeUtil.cells(x.asInstanceOf[ArrayData], geometry)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellGeometry", geometry,
      classOf[CellGeometry].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IndexEncodeUtil.cells($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IndexEncode {
  def pqCodes(embedding: Column, g: PqGeometry): Column =
    GraftColumnBridge.column(PqEncodeExpr(
      GraftColumnBridge.expression(embedding), g))

  def cells(embedding: Column, g: CellGeometry): Column =
    GraftColumnBridge.column(CellAssignExpr(
      GraftColumnBridge.expression(embedding), g))
}
