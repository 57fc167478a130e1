package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class StarSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("dimDate derives full attribute set with ISO weekday") {
    val orders = Seq((1L, 1L, "O", 10.0, ts("2024-03-05"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-03-09")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val rows = StarSchema.dimDate(orders, li).orderBy("date_id").collect()
    assert(rows.length == 2)
    val tue = rows.head // 2024-03-05 is a Tuesday
    assert(tue.getInt(0) == 20240305 && tue.getInt(2) == 2024)
    assert(tue.getString(5) == "March" && tue.getInt(7) == 2)
    assert(tue.getString(8) == "Tuesday" && !tue.getBoolean(9))
    val sat = rows(1) // 2024-03-09 is a Saturday
    assert(sat.getInt(7) == 6 && sat.getBoolean(9))
  }

  test("incrementalDimLoad emits only keys new after the cutoff") {
    val orders = Seq(
      (1L, 10L, "O", 1.0, ts("1997-01-01"), "1"), // old customer
      (2L, 10L, "O", 1.0, ts("1999-01-01"), "1"), // same customer again
      (3L, 20L, "O", 1.0, ts("1999-01-01"), "1")) // genuinely new
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val cust = Seq((10L, "a", 1, 0.0, "SEG"), (20L, "b", 1, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = StarSchema.incrementalDimLoad(orders, cust, "1998-01-01").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(20L))
  }

  test("factLineitem computes exact-decimal revenue and date keys") {
    val orders = Seq((1L, 1L, "O", 10.0, ts("2024-01-10"), "1"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq((1L, 1L, 1L, 1, 1.0, 100.0, 0.05, 0.0, "N", "O", ts("2024-02-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val r = StarSchema.factLineitem(li, orders).head
    assert(r.getAs[Int]("order_date_key") == 20240110)
    assert(r.getAs[Int]("ship_date_key") == 20240201)
    assert(r.getAs[Int]("days_to_ship") == 22)
    assert(r.getAs[Double]("revenue") == 95.0)
  }
}
