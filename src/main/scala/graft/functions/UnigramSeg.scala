package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-expression unigram-LM Viterbi segmentation.
  *
  * Replays [[graft.operators.UnigramLmOps]]' unrolled DP bit-for-bit —
  * b_j = max over piece lengths l of b_{j−l} · (p_nano / 10⁹) with
  * b_0 = 1.0 and missing pieces coalesced to 0; the backpointer prefers
  * the LONGEST piece on exact double equality against the max; the
  * reconstruction walks positions back emitting ≤ maxWordLen pieces
  * (piece_1 = the word's LAST piece, nulls beyond). Every arithmetic
  * step is the same IEEE double expression the former column form (and
  * the DuckDB oracle, which still unrolls the recurrence textually)
  * computes, so segmentations are identical.
  *
  * Why it exists: the column form pivoted a per-(word, j, l) explode
  * through a broadcast join into 42 probability columns and then built
  * ~60 sequential withColumn layers of DP/backpointer/reconstruction
  * expressions — Catalyst ANALYSIS of that tower, not the vocabulary
  * work, dominated both EM rounds (~3.3 s each at sf0.1 with well under
  * half a second of task time). One expression + a content-hashed vocab
  * reference collapses the plan to a single projection.
  */
final class SegVocab(val pieces: Array[String], val nanos: Array[Long],
    val maxPieceLen: Int, val maxWordLen: Int) extends Serializable {
  // keyed by UTF8String so lookups take the scan's native values; SQL
  // length/substring are codepoint-based and so are UTF8String's —
  // equivalence holds for any alphabet, not just ASCII
  @transient lazy val map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(UTF8String.fromString(pieces(i)), nanos(i)); i += 1
    }
    m
  }
  private val contentHash: Int =
    31 * (31 * java.util.Arrays.hashCode(pieces.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.hashCode(nanos)) + 31 * maxPieceLen + maxWordLen
  override def hashCode: Int = contentHash
  override def equals(o: Any): Boolean = o match {
    case v: SegVocab =>
      java.util.Arrays.equals(pieces.asInstanceOf[Array[AnyRef]],
        v.pieces.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(nanos, v.nanos) &&
        maxPieceLen == v.maxPieceLen && maxWordLen == v.maxWordLen
  case _ => false
  }
  override def toString: String = s"SegVocab(${contentHash.toHexString})"
}

object UnigramSegUtil {
  /** The DP over one word; returns maxWordLen piece slots (nulls beyond
    * the segmentation). Assumes the caller filtered words to
    * 1..maxWordLen chars, like the training word rollup does.
    */
  def segment(w: UTF8String, v: SegVocab): GenericArrayData = {
    val n = w.numChars()
    val maxL = v.maxPieceLen
    // b(0) = 1.0; cand(j, l) = b(j-l) * (p / 1e9), p coalesced to 0 —
    // the exact IEEE expression the unrolled column DP computed
    val b = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    b(0) = 1.0
    var j = 1
    while (j <= n) {
      val lMax = math.min(maxL, j)
      var best = Double.NegativeInfinity
      var l = 1
      while (l <= lMax) {
        val p = v.map.get(w.substring(j - l, j))
        val pd = if (p == null) 0.0 else p.longValue.toDouble / 1000000000.0
        val cand = b(j - l) * pd
        if (cand > best) best = cand
        l += 1
      }
      b(j) = best
      // backpointer: longest piece first on exact equality, else 1
      var pick = 1
      l = lMax
      var found = false
      while (!found && l >= 2) {
        val p = v.map.get(w.substring(j - l, j))
        val pd = if (p == null) 0.0 else p.longValue.toDouble / 1000000000.0
        if (b(j - l) * pd == b(j)) { pick = l; found = true }
        l -= 1
      }
      bp(j) = pick
      j += 1
    }
    val out = new Array[AnyRef](v.maxWordLen)
    var pos = n
    var t = 0
    while (pos >= 1 && t < v.maxWordLen) {
      val l = bp(pos)
      out(t) = w.substring(pos - l, pos)
      pos -= l
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class UnigramSegExpr(child: Expression, vocab: SegVocab)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_unigram_seg"

  override protected def nullSafeEval(w: Any): Any =
    UnigramSegUtil.segment(w.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("segVocab", vocab, classOf[SegVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSegUtil.segment($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSeg {
  def segment(w: Column, vocab: SegVocab): Column =
    GraftColumnBridge.column(UnigramSegExpr(
      GraftColumnBridge.expression(w), vocab))
}
