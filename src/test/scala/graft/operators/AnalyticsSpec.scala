package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private val orders = Seq(
    (1L, 10L, "O", 100.0, ts("2024-01-01"), "1-URGENT"),
    (2L, 10L, "F", 200.0, ts("2024-01-02"), "1-URGENT"),
    (3L, 20L, "O", 50.0, ts("2024-01-08"), "2-HIGH"))
    .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
  private val customer = Seq((10L, "a", 1, 0.0, "BUILDING"), (20L, "b", 1, 0.0, "AUTO"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  private val nation = Seq((1, "FRANCE", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
  private val region = Seq((0, "EUROPE")).toDF("r_regionkey", "r_name")

  test("topCustomersPerNation ranks by revenue with deterministic ties") {
    val out = Analytics.topCustomersPerNation(orders, customer, nation, n = 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 10L) // 300 > 50
  }

  test("rollingOrderVolume averages over a 7-day range frame") {
    val out = Analytics.rollingOrderVolume(orders).orderBy("order_date").collect()
    // Jan 8 window covers Jan 2..8 -> days with orders: Jan 2 (1), Jan 8 (1)
    assert(out.last.getDouble(2) == 1.0)
    assert(out.length == 3)
  }

  test("statusPivotByRegion produces the fixed-status crosstab") {
    val out = Analytics.statusPivotByRegion(orders, customer, nation, region).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("F") == 1L && r.getAs[Long]("O") == 2L && r.getAs[Long]("P") == 0L)
  }

  test("revenueRollup emits subtotals and a grand total") {
    val out = Analytics.revenueRollup(orders, customer, nation).collect()
    // (nation,segment) pairs: 2; nation subtotal: 1; grand total: 1
    assert(out.length == 4)
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getAs[Long]("n_orders") == 3L)
  }

  test("qualityReport counts rule violations in one scan") {
    val li = Seq((1L, 1L, 1L, 1, -2.0, 1.0, 1.5, 0.0, "N", "O", ts("2024-01-05")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val r = Analytics.qualityReport(orders, li).head
    assert(r.getAs[Long]("o_rows") == 3L && r.getAs[Long]("nonpositive_qty") == 1L)
    assert(r.getAs[Long]("bad_discount") == 1L)
  }
}
