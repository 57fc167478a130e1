package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("o_orderkey", "o_orderstatus", "price_cents")

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val old = snap((1L, "O", 100L), (2L, "O", 200L), (3L, "F", 300L),
      (4L, "O", 400L))
    val neu = snap((1L, "O", 100L), (2L, "F", 200L), (3L, "F", 333L),
      (5L, "O", 500L))
    val out = ChangeOps.snapshotDiff(old, neu)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(2L -> "update", 3L -> "update", 4L -> "delete",
      5L -> "insert"))
  }

  test("snapshotDiff carries old/new values with nulls on one-sided rows") {
    val old = snap((4L, "O", 400L))
    val neu = snap((5L, "O", 500L))
    val rows = ChangeOps.snapshotDiff(old, neu)
      .orderBy("o_orderkey").collect()
    val del = rows(0)
    assert(del.getString(1) == "delete" && del.getString(2) == "O" &&
      del.isNullAt(3) && del.getDouble(4) == 4.0 && del.isNullAt(5))
    val ins = rows(1)
    assert(ins.getString(1) == "insert" && ins.isNullAt(2) &&
      ins.getString(3) == "O" && ins.isNullAt(4) && ins.getDouble(5) == 5.0)
  }

  test("orderSnapshots exercises every change class deterministically") {
    val orders = (1L to 100L)
      .map(k => (k, if (k % 2 == 0) "O" else "F", k * 10.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val (old, neu) = ChangeOps.orderSnapshots(orders)
    val diff = ChangeOps.snapshotDiff(old, neu)
    val byType = diff.groupBy("change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // keys %7==0 and %5!=0 are inserts; %5==0 and %7!=0 deletes; both-present
    // keys with %3==0 (price bump) or %11==0 (status flip) are updates
    assert(byType.keySet == Set("insert", "delete", "update"))
    assert(byType("insert") == (1L to 100L)
      .count(k => k % 7 == 0 && k % 5 != 0))
    assert(byType("delete") == (1L to 100L)
      .count(k => k % 5 == 0 && k % 7 != 0))
    // price bump is exact integer cents: 10% of k*10.00 = k cents
    val upd = diff.filter(col("o_orderkey") === 6L).collect()(0)
    assert(upd.getDouble(4) == 60.0 && upd.getDouble(5) == 66.0)
  }

  private def fpTables = {
    val ts = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    val orders = Seq((1L, 10L, "O", 100.50, ts, "1-URGENT"),
      (2L, 11L, "F", 200.00, ts, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = Seq((1L, 5L, 7L, 1, 3.0, 99.99, "N", "O", ts))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val customer = Seq((10L, "Customer#1", 3, 500.25, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    (orders, lineitem, customer)
  }

  test("tableFingerprint is row-order/partitioning-invariant and change-sensitive") {
    val (orders, lineitem, customer) = fpTables
    def fps(o: org.apache.spark.sql.DataFrame) =
      ChangeOps.tableFingerprint(o, lineitem, customer)
        .orderBy("table_name").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = fps(orders)
    assert(base.map(_._1).toSeq == Seq("customer", "lineitem", "orders"))
    // shuffled/repartitioned input → identical fingerprints
    assert(fps(orders.repartition(7).orderBy(col("o_orderkey").desc))
      .sameElements(base))
    // a one-cent change flips both hashes but not the row count
    val tweaked = fps(orders.withColumn("o_totalprice",
      when(col("o_orderkey") === 1L, 100.51).otherwise(col("o_totalprice"))))
    val (b, t) = (base.find(_._1 == "orders").get, tweaked.find(_._1 == "orders").get)
    assert(t._2 == b._2 && t._3 != b._3 && t._4 != b._4)
    // duplicating a row twice: XOR is blind (x⊕x = 0) — the additive
    // sum is exactly what catches even-multiplicity duplicates
    val dup = fps(orders.unionAll(orders.filter(col("o_orderkey") === 1L))
      .unionAll(orders.filter(col("o_orderkey") === 1L)))
    val d = dup.find(_._1 == "orders").get
    assert(d._2 == b._2 + 2 && d._3 == b._3 && d._4 != b._4)
  }

  test("deltaJoinMaintenance: delta legs reconstruct the full join exactly") {
    // orders 10,20 are ΔO (key % 10 = 0); lineitem key 7 is ΔL (% 7 = 0)
    val orders = Seq(3L, 7L, 10L, 20L).map(k => (k, "O"))
      .toDF("o_orderkey", "o_orderstatus")
    val lineitem = Seq(
      (3L, 1, 10.0, 0.0), (7L, 1, 20.0, 0.0),
      (10L, 1, 30.0, 0.0), (20L, 1, 40.0, 0.0))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    val got = ChangeOps.deltaJoinMaintenance(orders, lineitem).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("old_view") == ((1L, 10000000L)))          // key 3
    assert(got("delta_orders_join") == ((2L, 70000000L))) // keys 10, 20
    assert(got("delta_lineitem_join") == ((1L, 20000000L))) // key 7
    assert(got("delta_both_join") == ((0L, 0L)))
    // the IVM identity: the four legs sum to the full recompute
    assert(got("incremental_total") == got("full_recompute"))
    assert(got("full_recompute") == ((4L, 100000000L)))
  }
}
