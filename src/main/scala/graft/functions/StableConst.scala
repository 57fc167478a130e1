package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** A double constant that codegen delivers through the references array
  * instead of pasting into the generated source.
  *
  * Why it exists: `lit(someDouble)` inlines the value into the generated
  * Java text, so any plan template re-instantiated with fresh constants
  * (a Lloyd's training loop re-encoding against each iteration's
  * codebook; 128 such constants per pass here) produces NEW source every
  * time and pays a full janino compile per iteration — measured as the
  * dominant cost of the whole PQ/IVF training family, far above the data
  * work. `foldable = false` keeps the optimizer from constant-folding it
  * back into an inline literal; the value itself and every downstream
  * double operation are unchanged, so results are bit-identical to the
  * `lit` form.
  *
  * Deliberately NOT a general literal replacement: folding `lit`s is
  * usually what you want (predicate pushdown, pruning, simplification
  * all feed on real literals). Use it only where a training-loop plan
  * template churns constants.
  */
case class StableConstExpr(value: Double) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_stable_const"

  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // boxed once per plan instance; the generated source is identical
    // for every value, so one compiled class serves all of them
    val ref = ctx.addReferenceObj("graftStableConst",
      java.lang.Double.valueOf(value), "java.lang.Double")
    ev.copy(
      code = code"final double ${ev.value} = $ref.doubleValue();",
      isNull = FalseLiteral,
      value = JavaCode.variable(ev.value.toString, DoubleType))
  }
}

object StableConst {
  def apply(v: Double): Column = GraftColumnBridge.column(StableConstExpr(v))
}
