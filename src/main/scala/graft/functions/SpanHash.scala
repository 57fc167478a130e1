package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All sliding `span`-token window hashes of a token array in ONE
  * codegen'd pass: element i is the md5-prefix-`nHex` hash (same
  * semantics as [[Md5Prefix]]) of `tokens[i..i+span-1]` joined by a
  * single space. Replaces the lead()-window formulation of span
  * shingling, which paid a full shuffle + per-doc sort of every TOKEN
  * INSTANCE just to line up adjacent tokens — adjacency is already
  * explicit in the array, so the windows can be enumerated row-local
  * with zero exchange. (A higher-order `transform(sequence(...))`
  * could also express this but runs interpreted in Spark 4 and
  * re-slices the array per element; this expression is a tight loop
  * over the backing array with one hash per window.)
  */
object SpanHashUtil {
  def spanHashes(arr: ArrayData, span: Int, nHex: Int): ArrayData = {
    val n = arr.numElements()
    if (n < span) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Long](n - span + 1)
    val window = new Array[UTF8String](span)
    i = 0
    while (i <= n - span) {
      var j = 0
      while (j < span) { window(j) = toks(i + j); j += 1 }
      out(i) = Md5PrefixUtil.md5PrefixLong(UTF8String.concatWs(sep, window: _*), nHex)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SpanHashExpr(child: Expression, span: Int, nHex: Int)
    extends UnaryExpression {
  require(span >= 1, "span must be positive")
  require(nHex >= 1 && nHex <= 15, "nHex must be 1..15 to stay positive in a long")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"

  override protected def nullSafeEval(a: Any): Any =
    SpanHashUtil.spanHashes(a.asInstanceOf[ArrayData], span, nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SpanHashUtil.spanHashes($a, $span, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanHash {
  /** Array of md5-prefix-8 hashes of every `span`-token window. */
  def spanHashes(tokens: Column, span: Int): Column =
    GraftColumnBridge.column(
      SpanHashExpr(GraftColumnBridge.expression(tokens), span, 8))
}
