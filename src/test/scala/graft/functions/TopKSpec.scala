package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopKLongs equals sort-desc-take-k per group, across partitions") {
    val topk = udaf(new TopKLongs(3), org.apache.spark.sql.Encoders.scalaLong)
    val df = Seq(
      ("a", 5L), ("a", 1L), ("a", 9L), ("a", 9L), ("a", 2L), // tie at 9 kept twice
      ("b", 7L))
      .toDF("g", "v").repartition(4) // force partial-state merges
    val out = df.groupBy($"g").agg(topk($"v").as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(9L, 9L, 5L))
    assert(out("b") == Seq(7L))
  }

  test("property: aggregator matches reference top-k for random inputs") {
    val agg = new TopKLongs(4)
    val rng = new scala.util.Random(1234)
    (1 to 500).foreach { _ =>
      val xs = List.fill(rng.nextInt(20))(rng.nextLong() % 1000)
      // exercise reduce AND merge by splitting into two partial states
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rng.nextInt(xs.length + 1))
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      val got = agg.finish(agg.merge(bufL, bufR))
      val want = xs.sorted(Ordering[Long].reverse).take(4)
      assert(got == want, s"input $xs")
    }
  }
}
