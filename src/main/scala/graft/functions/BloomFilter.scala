package graft.functions

import org.apache.spark.sql.{Column, Encoder, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Distributed Bloom filter over a long key column — the runtime-filter
  * building block for join pruning at scale: when the dim side's ROW
  * data is too big to broadcast but its KEY SET fits a few hundred KB of
  * bits, broadcasting the bloom and filtering the fact BEFORE its
  * shuffle removes the overwhelmingly non-matching rows for the cost of
  * a codegen'd bit probe per row (the same pattern Spark's own
  * InjectRuntimeFilter applies when its thresholds allow — here exposed
  * as an explicit, composable operator).
  *
  * Hashing: two splitmix64-derived hashes, double-hashing probes
  * h1 + i·h2 over a power-of-two bit space — deterministic across
  * sessions/partitionings, no RNG.
  */
object BloomUtil {
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits for `key` in `words` (m = words.length*64,
    * power of two).
    */
  def add(words: Array[Long], key: Long, k: Int): Unit = {
    val m = words.length.toLong * 64
    val h1 = splitmix64(key)
    val h2 = splitmix64(key ^ 0xdeadbeef1337c0deL) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % m
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Probe — false negatives are impossible; false positives are culled
    * by the exact join that follows.
    */
  def mightContain(words: ArrayData, key: Long, k: Int): Boolean = {
    val m = words.numElements().toLong * 64
    val h1 = splitmix64(key)
    val h2 = splitmix64(key ^ 0xdeadbeef1337c0deL) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % m
      if ((words.getLong((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }
}

/** Mergeable bloom-build aggregate: partial bit arrays OR together, so
  * the build is one map-side-combined pass over the dim keys; the
  * finished filter is `numBits/64` longs however many keys went in.
  */
class BloomFilterAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require((numBits & (numBits - 1)) == 0, "numBits must be a power of two")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    BloomUtil.add(buf, key, numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Codegen'd membership probe over (bloom words array, long key) — stays
  * inside whole-stage codegen so the pre-shuffle fact filter costs a few
  * multiplies per row, not an interpreted lambda.
  */
case class BloomMightContainExpr(left: Expression, right: Expression,
    numHashes: Int) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(words: Any, key: Any): Any =
    BloomUtil.mightContain(words.asInstanceOf[ArrayData],
      key.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, x) =>
      s"graft.functions.BloomUtil.mightContain($w, $x, $numHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFilter {
  /** Column probe API: `mightContain(bloomCol, keyCol)`. */
  def mightContain(bloom: Column, key: Column, numHashes: Int = 5): Column =
    GraftColumnBridge.column(BloomMightContainExpr(
      GraftColumnBridge.expression(bloom),
      GraftColumnBridge.expression(key), numHashes))
}
