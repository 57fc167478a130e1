package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def lines(rows: (Long, Int, Double, Double)*) =
    rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")

  /** Quadratic reference: keep rows no other row strictly beats on both. */
  private def bruteFrontier(rows: Seq[(Long, Int, Double, Double)]) =
    rows.filterNot { case (_, _, p, q) =>
      rows.exists { case (_, _, p2, q2) => p2 < p && q2 > q }
    }.map { case (k, l, p, q) => (k, l, p, q.toLong) }.toSet

  test("frontier matches the quadratic definition, ties kept") {
    val rows = Seq(
      (1L, 1, 100.0, 10.0), // frontier: cheapest
      (2L, 1, 200.0, 10.0), // dominated by 1 (pricier, same qty → kept!
      //   dominance needs STRICTLY more qty) — actually non-dominated
      (3L, 1, 200.0, 20.0), // frontier
      (4L, 1, 300.0, 15.0), // dominated by 3 (cheaper AND more qty)
      (5L, 1, 300.0, 25.0), // frontier
      (6L, 1, 100.0, 10.0)) // duplicate of 1 → kept (nothing strict)
    val got = SkylineOps.priceQuantityFrontier(lines(rows: _*))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == bruteFrontier(rows))
    assert(got.map(_._1) == Set(1L, 2L, 3L, 5L, 6L))
  }

  test("two-level bucketing agrees with brute force across bucket boundaries") {
    // prices straddle several 1000-dollar buckets; qty cycles so
    // dominance crosses bucket lines
    val rows = (1 to 400).map { i =>
      (i.toLong, 1, 500.0 + i * 17.0, ((i * 13) % 50 + 1).toDouble)
    }
    val got = SkylineOps.priceQuantityFrontier(lines(rows: _*))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == bruteFrontier(rows))
  }

  test("supplierAbcClasses splits cumulative revenue at 80/95") {
    // revenues 50, 30, 15, 5 → cum shares 50%, 80%, 95%, 100% → A A B C
    val li = Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 5.0))
      .toDF("l_suppkey", "l_extendedprice")
    val classes = Analytics.supplierAbcClasses(li)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(classes == Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "C"))
  }
}
