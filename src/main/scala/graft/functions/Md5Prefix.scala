package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First `nHex` hex digits of md5(utf8(s)) as a positive long — the
  * codegen'd equivalent of `conv(substr(md5(s), 1, nHex), 16, 10)` without
  * the hex-string round-trip (md5 → hex → substring → base-conversion →
  * cast), which dominates shingle/token hashing at scale. Semantics are
  * unchanged, so the DuckDB oracle (`('0x'||substr(md5(s),1,n))::BIGINT`)
  * still matches exactly.
  */
object Md5PrefixUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5PrefixLong(s: UTF8String, nHex: Int): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // big-endian value of the first ceil(nHex/2) bytes, truncated to nHex
    // hex digits (= 4*nHex bits)
    var v = 0L
    var i = 0
    val fullBytes = nHex / 2
    while (i < fullBytes) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    if ((nHex & 1) == 1) v = (v << 4) | ((d(fullBytes) & 0xf0L) >> 4)
    v
  }
}

case class Md5PrefixExpr(child: Expression, nHex: Int) extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15, "nHex must be 1..15 to stay positive in a long")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override protected def nullSafeEval(s: Any): Any =
    Md5PrefixUtil.md5PrefixLong(s.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.Md5PrefixUtil.md5PrefixLong($s, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix {
  def md5PrefixLong(c: Column, nHex: Int): Column =
    GraftColumnBridge.column(Md5PrefixExpr(GraftColumnBridge.expression(c), nHex))
}
