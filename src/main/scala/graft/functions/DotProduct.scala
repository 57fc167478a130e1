package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Strict left-fold dot product over two float-array columns, in double.
  *
  * Semantically identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * but codegen'd: Spark's higher-order array functions evaluate their
  * lambdas interpreted, which dominates ANN scans; this stays inside
  * whole-stage codegen as a tight primitive loop. The fold order (index
  * 0→n, accumulator starts at 0.0) is the contract the DuckDB oracle's
  * `list_reduce` reproduces bit-for-bit.
  */
object DotProductUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API over `array<float>` columns. */
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
