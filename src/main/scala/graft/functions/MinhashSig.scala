package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document shingle hashing in ONE codegen'd pass — the scalar
  * core of the dedup family. The explode-based formulation materialized
  * one row per character shingle (~|text| rows per document) and pushed
  * them through a 32-buffer min aggregate (MinHash) or a collect_set
  * shuffle (Jaccard); both reductions are associative folds a tight
  * per-row loop computes without leaving the scan stage. Hash and
  * permutation constants are [[HashFns]]' — the DuckDB oracle recomputes
  * identical integers, so swapping the physical computation is invisible
  * to the correctness gate.
  */
object MinhashSigUtil {
  private val A: Array[Long] =
    Array.tabulate(HashFns.MinhashK)(HashFns.minhashA)
  private val B: Array[Long] =
    Array.tabulate(HashFns.MinhashK)(HashFns.minhashB)
  private val P: Long = HashFns.MinhashP

  /** K min-hashes of the char-`k`-gram shingle hashes of `t`; null when
    * the text is too short to carry a single shingle (callers filter).
    */
  def signature(t: UTF8String, k: Int): ArrayData = {
    val n = t.numChars()
    if (n < k) return null
    val kk = A.length
    val mins = Array.fill(kk)(Long.MaxValue)
    var i = 1
    while (i <= n - k + 1) {
      val h = Md5PrefixUtil.md5PrefixLong(t.substringSQL(i, k), 8)
      var j = 0
      while (j < kk) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 60-bit SimHash over the whitespace-token multiset of (normalized)
    * `t`: per token, md5-prefix-15 hash; each bit position accumulates
    * ±1 by the hash bit; the result sets bits with counter ≥ 0.
    * Returns Long.MinValue (a sentinel outside the 60-bit range — the
    * expression maps it to NULL) when the text has no tokens.
    */
  def simhash60(t: UTF8String): Long = {
    val bytes = t.getBytes
    if (bytes.isEmpty) return Long.MinValue
    val counters = new Array[Int](60)
    var start = 0
    var any = false
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          any = true
          val h = Md5PrefixUtil.md5PrefixLong(
            UTF8String.fromBytes(bytes, start, i - start), 15)
          var j = 0
          while (j < 60) {
            if (((h >> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) return Long.MinValue
    var sim = 0L
    var j = 0
    while (j < 60) {
      if (counters(j) >= 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  /** Distinct char-`k`-gram shingle hashes of `t`, SORTED ascending
    * (consumers are order-insensitive — size, explode — and the sorted
    * layout lets [[sortedIntersectCount]] verify candidate pairs with a
    * linear merge instead of array_intersect's per-pair hash set).
    * Null when the text carries no shingle.
    */
  def distinctHashes(t: UTF8String, k: Int): ArrayData = {
    val n = t.numChars()
    if (n < k) return null
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 1
    while (i <= n - k + 1) {
      val h = Md5PrefixUtil.md5PrefixLong(t.substringSQL(i, k), 8)
      if (seen.add(h)) out += h
      i += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** |A ∩ B| of two sorted distinct long arrays by linear merge —
    * replaces size(array_intersect(...)) in the set-similarity verifies
    * (identical count: both inputs are distinct, so intersect size is
    * the merge-match count). O(|A|+|B|), no per-pair hash set.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** K min-hashes derived from an already-hashed distinct-shingle array:
    * the same (A·h + B) mod P fold as [[signature]] — min over the
    * DISTINCT set equals min over the positional multiset, and the md5
    * per shingle was already paid by [[distinctHashes]], so deriving
    * from the memoized shingle sets removes a whole text+md5 corpus
    * pass. Never null for a non-null input array (distinctHashes
    * returns null, not empty, for shingle-less text).
    */
  def signatureFromShingles(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val kk = A.length
    val mins = Array.fill(kk)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var j = 0
      while (j < kk) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

abstract class ShingleFoldExpr extends UnaryExpression {
  def k: Int
  def helper: String
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) null else evalString(c.asInstanceOf[UTF8String])
  }
  protected def evalString(t: UTF8String): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashSigUtil.$helper($c, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
}

case class MinhashSigExpr(child: Expression, k: Int) extends ShingleFoldExpr {
  override def helper: String = "signature"
  override def prettyName: String = "graft_minhash_sig"
  override protected def evalString(t: UTF8String): Any =
    MinhashSigUtil.signature(t, k)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) null
    else {
      val r = MinhashSigUtil.simhash60(c.asInstanceOf[UTF8String])
      if (r == Long.MinValue) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashSigUtil.simhash60($c);
      if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DistinctShinglesExpr(child: Expression, k: Int) extends ShingleFoldExpr {
  override def helper: String = "distinctHashes"
  override def prettyName: String = "graft_distinct_shingles"
  override protected def evalString(t: UTF8String): Any =
    MinhashSigUtil.distinctHashes(t, k)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| of two sorted distinct long arrays (the
  * [[DistinctShinglesExpr]] layout) by linear merge.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinhashSigUtil.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.MinhashSigUtil.sortedIntersectCount($a, $b);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** K-min MinHash signature derived from an already-hashed
  * distinct-shingle array (see [[MinhashSigUtil.signatureFromShingles]]).
  */
case class MinhashFromShinglesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_from_shingles"

  override protected def nullSafeEval(xs: Any): Any =
    MinhashSigUtil.signatureFromShingles(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashSigUtil.signatureFromShingles($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  /** K=32 MinHash signature of the normalized text's char-k shingles. */
  def signature(normText: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinhashSigExpr(GraftColumnBridge.expression(normText), k))

  /** Distinct shingle-hash array of the normalized text. */
  def distinctShingles(normText: Column, k: Int): Column =
    GraftColumnBridge.column(
      DistinctShinglesExpr(GraftColumnBridge.expression(normText), k))

  /** 60-bit SimHash of the normalized text's token multiset. */
  def simhash(normText: Column): Column =
    GraftColumnBridge.column(
      SimhashExpr(GraftColumnBridge.expression(normText)))

  /** Merge-count |A ∩ B| of two sorted distinct long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCountExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** MinHash signature derived from a distinct-shingle array. */
  def signatureFromShingles(xs: Column): Column =
    GraftColumnBridge.column(
      MinhashFromShinglesExpr(GraftColumnBridge.expression(xs)))
}
