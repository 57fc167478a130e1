package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a typed, mergeable Spark
  * [[Aggregator]] — the custom-aggregate tier of the expression ladder.
  *
  * `capacity` counters summarize a stream of keys; any key with frequency
  * > N/(capacity+1) is guaranteed kept, and when the number of distinct
  * keys never exceeds `capacity` the counts are EXACT (which is how the
  * oracle checks it against plain GROUP BY counts on the events table).
  * Partial sketches merge associatively, so Spark runs it with map-side
  * combine like any native aggregate.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], key: String): mutable.Map[String, Long] = {
    if (buf.contains(key) || buf.size < capacity) {
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
    } else {
      // decrement-all step; drop zeroed counters
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keys.foreach { k =>
        val v = buf(k) - 1L
        if (v == 0L) dead += k else buf.update(k, v)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // subtract the (size-capacity+1)-th largest count from all, keep positives
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      val kept = a.filter(_._2 > cut).map { case (k, v) => k -> (v - cut) }
      mutable.Map(kept.toSeq: _*)
    } else a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] = buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
