package graft.functions

import org.apache.spark.sql.{Column, Encoder, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch over a string key column: fixed `depth × width`
  * counter grid, one splitmix64-derived hash row per depth level,
  * estimate = min over rows. Partial grids ADD elementwise (fully
  * mergeable → map-side combined like any native aggregate), so
  * frequency estimation over 100 TB of keys carries a few KB of state
  * per partition regardless of key cardinality — the sketch companion
  * to [[HeavyHitters]] (which keeps WHO is frequent; the CMS answers
  * "how often is X" for any X after the fact).
  *
  * Guarantees (deterministic, no RNG): estimate ≥ true count always;
  * estimate ≤ true count + overcount where overcount is bounded by the
  * colliding mass per row — the query surfaces both as oracle-checkable
  * tolerance-band booleans.
  */
object CountMinUtil {
  /** 64-bit string hash for depth row `row` — FNV-ish fold then
    * splitmix finalization, identical bytes → identical hash on any
    * JVM/partitioning.
    */
  def hash(s: UTF8String, row: Int): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ BloomUtil.splitmix64(row.toLong)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    BloomUtil.splitmix64(h)
  }

  def estimate(grid: ArrayData, key: UTF8String, width: Int): Long = {
    val depth = grid.numElements() / width
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = (hash(key, d) & Long.MaxValue) % width
      val c = grid.getLong(d * width + idx.toInt)
      if (c < best) best = c
      d += 1
    }
    best
  }
}

/** Mergeable CMS build aggregate: flat Array[Long] of depth rows ×
  * width counters.
  */
class CountMinAgg(width: Int, depth: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    val u = UTF8String.fromString(key)
    var d = 0
    while (d < depth) {
      val idx = (CountMinUtil.hash(u, d) & Long.MaxValue) % width
      buf(d * width + idx.toInt) += 1
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Codegen'd point estimate over (sketch grid, string key). */
case class CmsEstimateExpr(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_cms_estimate"

  override protected def nullSafeEval(grid: Any, key: Any): Any =
    CountMinUtil.estimate(grid.asInstanceOf[ArrayData],
      key.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, k) =>
      s"graft.functions.CountMinUtil.estimate($g, $k, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  def estimate(sketch: Column, key: Column, width: Int): Column =
    GraftColumnBridge.column(CmsEstimateExpr(
      GraftColumnBridge.expression(sketch),
      GraftColumnBridge.expression(key), width))
}
