package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Perceptual media fingerprint: a blockhash-style 60-bit signature of a
  * BINARY payload in one codegen'd pass — the media analog of
  * [[MinhashSigUtil.simhash60]]. The payload is cut into 60 equal-share
  * blocks (byte j belongs to block ⌊j·60/len⌋); a bit is set when its
  * block's unsigned-byte mass exceeds the payload mean (the
  * exact-integer form `sum·60 > total` — the classic blockhash uses the
  * median; the mean keeps the whole computation division-free and
  * engine-replayable). Local byte edits — the byte-level stand-in for a
  * re-encode/resize, which [[graft.operators.MultimodalOps.stubDecode]]
  * would feed as decoded luma in a real codec build — perturb few block
  * sums, so near-identical payloads land within a small Hamming
  * distance while a content checksum sees unrelated blobs.
  */
object BlockHashUtil {
  final val Bits = 60

  /** 60-bit blockhash; Long.MinValue sentinel (→ NULL) for empty. */
  def blockhash60(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return Long.MinValue
    val sums = new Array[Long](Bits)
    var total = 0L
    var j = 0
    while (j < len) {
      val b = payload(j) & 0xff
      sums(((j.toLong * Bits) / len).toInt) += b
      total += b
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < Bits) {
      if (sums(i) * Bits > total) fp |= (1L << i)
      i += 1
    }
    fp
  }
}

case class BlockHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_blockhash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) null
    else {
      val r = BlockHashUtil.blockhash60(c.asInstanceOf[Array[Byte]])
      if (r == Long.MinValue) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BlockHashUtil.blockhash60($c);
      if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BlockHash {
  /** 60-bit perceptual blockhash of a binary payload column. */
  def blockhash(payload: Column): Column =
    GraftColumnBridge.column(
      BlockHashExpr(GraftColumnBridge.expression(payload)))
}
