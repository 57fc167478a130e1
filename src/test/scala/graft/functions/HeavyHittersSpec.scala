package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact counts when distinct keys fit the capacity") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c"))
      .toDF("k").repartition(4)
    val hh = udaf(new HeavyHitters(16), Encoders.STRING)
    val out = df.agg(hh(col("k")).as("s")).select(explode(col("s")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("a" -> 30L, "b" -> 20L, "c" -> 5L))
  }

  test("keeps the true heavy hitter under contention (capacity 2)") {
    // 100x "hot" vs 9 singletons: MG with 2 counters must retain "hot"
    val keys = scala.util.Random.shuffle(
      Seq.fill(100)("hot") ++ (1 to 9).map(i => s"rare$i"))
    val df = keys.toDF("k").coalesce(1) // single partition = pure MG stream
    val hh = udaf(new HeavyHitters(2), Encoders.STRING)
    val out = df.agg(hh(col("k")).as("s")).select(explode(col("s")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.contains("hot"))
    assert(out("hot") >= 100L - 9L) // MG undercount bound: true - (N/(c+1))
  }
}
