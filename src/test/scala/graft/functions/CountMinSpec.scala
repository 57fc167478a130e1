package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(keys: Seq[String], width: Int, depth: Int,
      partitions: Int): Map[String, Long] = {
    val cms = udaf(new CountMinAgg(width, depth), Encoders.STRING)
    val sketch = keys.toDF("k").repartition(partitions)
      .agg(cms(col("k")).as("sketch"))
    keys.distinct.toDF("k").join(broadcast(sketch))
      .select(col("k"), CountMin.estimate(col("sketch"), col("k"), width)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates are exact when the grid is wide enough for the keys") {
    val keys = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val est = estimates(keys, width = 1024, depth = 4, partitions = 1)
    assert(est == Map("alpha" -> 40L, "beta" -> 7L, "gamma" -> 1L))
  }

  test("partitioned build merges to the same grid as a single partition") {
    val keys = (1 to 500).map(i => s"k${i % 37}")
    val a = estimates(keys, 256, 4, partitions = 8)
    val b = estimates(keys, 256, 4, partitions = 1)
    assert(a == b)
  }

  test("never undercounts, even under forced collisions") {
    val keys = (1 to 300).flatMap(i => Seq.fill(i % 5 + 1)(s"key$i"))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // width 8: heavy collisions guaranteed
    val est = estimates(keys, width = 8, depth = 2, partitions = 4)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"undercount for $k: ${est(k)} < $n")
    }
  }
}
