package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k of values as a typed, mergeable [[Aggregator]] —
  * the scale-friendly alternative to a ranked window for per-group
  * top-k: a `row_number() ≤ k` window SORTS every group's full history
  * per partition, while this aggregate carries at most k values per
  * group through the shuffle and map-side-combines like any native
  * aggregate. Partial states merge associatively (concat, keep k
  * largest), so the result is EXACT — it is a bounded-state exact
  * computation, not a sketch.
  *
  * Output: the k largest values in descending order (a multiset — ties
  * are kept as duplicates).
  */
class TopKLongs(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  // buffers stay tiny (≤ k elements) — insertion into a sorted array is
  // O(k) and allocation-light, no heap structure needed
  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length < k) (buf :+ v).sorted
    else if (v > buf(0)) { buf(0) = v; buf.sorted }
    else buf

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val all = a ++ b
    java.util.Arrays.sort(all)
    all.takeRight(k)
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    buf.sorted(Ordering[Long].reverse).toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
