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

  test("supplierAbcClasses two-level prefix-sum is bucket-width-invariant") {
    // the bucketed decomposition must equal the global cumulative for
    // ANY bucket width: one-supplier-per-bucket, mid, one-big-bucket
    // (the degenerate naive form)
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    def classes(bucketCents: Long) =
      Analytics.supplierAbcClasses(li, bucketCents).orderBy("l_suppkey")
        .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    val one = classes(1000L)
    assert(one == classes(10000000L))
    assert(one == classes(Long.MaxValue))
    assert(one.map(_._2).toSet == Set("A", "B", "C"))
  }

  test("robustPriceStats: median/MAD shrug off the outlier the mean can't") {
    val o = (Seq((1L, 1.0, "A"), (2L, 2.0, "A"), (3L, 3.0, "A"),
      (4L, 4.0, "A"), (5L, 100.0, "A")) ++
      (10L to 13L).map(i => (i, 10.0, "B")))
      .map { case (k, p, g) => (k, p, g) }
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val out = Analytics.robustPriceStats(o).orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    // A: values 1..4,100 → median 3, MAD 1 (the 100 outlier moves the
    // mean to 22 but the robust pair barely notices); P5=1, P95=100
    // (n=5 keeps the tail), winsorized mean = plain mean here.
    // B: constant 10s → median 10, MAD 0.
    assert(out == Seq(
      ("A", 5L, 3L, 1L, 1L, 100L, 22.0),
      ("B", 4L, 10L, 0L, 10L, 10L, 10.0)))
  }

  test("kmvIntersection is exact below k and in-band above it") {
    def ev(id: Long, user: Long, typ: String) =
      (id, ts("2024-01-01"), user, typ, 0.0, "{}")
    // 10 viewers, purchasers 5..14 → union 14, intersection 6 — all
    // under k=64, so the sketch IS the set and estimates are exact
    val small = ((1L to 10L).map(u => ev(u, u, "view")) ++
      (5L to 14L).map(u => ev(100 + u, u, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Analytics.kmvIntersection(small).collect()(0)
    assert(s.getAs[Long]("est_union") == 14L &&
      s.getAs[Long]("exact_union") == 14L)
    assert(s.getAs[Long]("est_intersection") == 6L &&
      s.getAs[Long]("exact_intersection") == 6L)
    assert(s.getAs[Boolean]("union_within_40pct") &&
      s.getAs[Boolean]("intersection_within_40pct"))
    // 200 viewers, even purchasers → sketch path (union > k): the
    // estimator must land in band and the sketch overlap is bounded by k
    val big = ((1L to 200L).map(u => ev(u, u, "view")) ++
      (1L to 200L).filter(_ % 2 == 0).map(u => ev(1000 + u, u, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val b = Analytics.kmvIntersection(big).collect()(0)
    assert(b.getAs[Long]("exact_union") == 200L &&
      b.getAs[Long]("exact_intersection") == 100L)
    assert(b.getAs[Long]("est_union") != 200L) // genuinely estimated
    assert(b.getAs[Boolean]("union_within_40pct") &&
      b.getAs[Boolean]("intersection_within_40pct"))
  }

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

  test("lateShipmentPriority counts each order once however many late lines") {
    val li = Seq(
      (1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-03-15")),
      (1L, 1L, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-03-20")),
      (2L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-15")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val out = Analytics.lateShipmentPriority(orders, li).collect()
    // order 1 (two >60-day lines) counts once; order 2 shipped in 13 days
    assert(out.length == 1)
    assert(out.head.getString(0) == "1-URGENT")
    assert(out.head.getAs[Long]("n_late_orders") == 1L)
  }

  test("customerOrderDistribution includes zero-order customers") {
    val withLurker = customer.union(
      Seq((30L, "c", 1, 0.0, "AUTO"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    val out = Analytics.customerOrderDistribution(withLurker, orders).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_customers")).toMap
    // cust 10 → 2 orders, cust 20 → 1, cust 30 → 0
    assert(out == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("customerSpendQuartiles ranks exact spend into ntile(4)") {
    val cs = Seq((1L, "a", 1, 0.0, "SEG"), (2L, "b", 1, 0.0, "SEG"),
      (3L, "c", 1, 0.0, "SEG"), (4L, "d", 1, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val os = Seq(
      (1L, 1L, "O", 250.0, ts("2024-01-01"), "x"),
      (2L, 1L, "O", 150.0, ts("2024-01-01"), "x"),
      (3L, 2L, "O", 300.0, ts("2024-01-01"), "x"),
      (4L, 3L, "O", 200.0, ts("2024-01-01"), "x"),
      (5L, 4L, "O", 100.0, ts("2024-01-01"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.customerSpendQuartiles(os, cs).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("spend_quartile")).toMap
    // spends: c1=400, c2=300, c3=200, c4=100
    assert(out == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
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

  test("returnedItemCustomers sums only R-flag lines inside the window") {
    val li = Seq(
      (1L, 1L, 1L, 1, 1.0, 100.0, 0.1, 0.0, "R", "O", ts("2024-01-05")),
      (1L, 1L, 1L, 2, 1.0, 50.0, 0.0, 0.0, "N", "O", ts("2024-01-05")),
      (2L, 1L, 1L, 1, 1.0, 75.0, 0.0, 0.0, "R", "O", ts("2024-02-05")),
      (3L, 1L, 1L, 1, 1.0, 999.0, 0.0, 0.0, "R", "O", ts("2024-06-05")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    // orders 1,2 (cust 10) in window; order 3 (cust 20) out of window
    val os = Seq(
      (1L, 10L, "O", 100.0, ts("2024-01-01"), "x"),
      (2L, 10L, "O", 100.0, ts("2024-02-01"), "x"),
      (3L, 20L, "O", 100.0, ts("2024-07-01"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.returnedItemCustomers(li, os, customer, nation,
      from = "2024-01-01", until = "2024-07-01").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("c_custkey") == 10L)
    assert(r.getAs[Long]("n_return_lines") == 2L)
    // 100*(1-0.1) + 75 = 165
    assert(r.getAs[Double]("returned_revenue") == 165.0)
  }

  test("smallQtyRevenue keeps lines under 20% of the part's avg quantity") {
    val parts = Seq((1L, "p1", "Brand#23", "T", 1, 10.0),
      (2L, "p2", "Brand#99", "T", 1, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    // part 1: quantities 1, 10, 10 → avg 7, threshold 1.4 → only qty=1 kept
    val li = Seq(
      (1L, 1L, 1L, 1, 1.0, 70.0, 0.0, 0.0, "N", "O", ts("2024-01-05")),
      (2L, 1L, 1L, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-05")),
      (3L, 1L, 1L, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-05")),
      (4L, 2L, 1L, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", ts("2024-01-05")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val r = Analytics.smallQtyRevenue(li, parts).head
    assert(r.getAs[Long]("n_lines") == 1L)
    assert(r.getAs[Double]("avg_yearly") == 10.0) // 70 / 7
  }

  test("largeOrderCustomers keeps only orders above the quantity threshold") {
    val li = Seq(
      (1L, 1L, 1L, 1, 200.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-05")),
      (1L, 1L, 1L, 2, 150.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-05")),
      (2L, 1L, 1L, 1, 299.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-05")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val out = Analytics.largeOrderCustomers(li, orders, customer).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("o_orderkey") == 1L)
    assert(out.head.getAs[Double]("sum_qty") == 350.0)
  }

  test("volumeShipping keeps only cross-nation supplier→customer pairs") {
    val nations = Seq((1, "FRANCE", 0), (2, "CANADA", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val sup = Seq((1L, "s1", 1, 0.0), (2L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val cust = Seq((10L, "a", 1, 0.0, "SEG"), (20L, "b", 2, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val os = Seq(
      (1L, 20L, "O", 1.0, ts("2024-01-01"), "x"),  // cust CANADA
      (2L, 10L, "O", 1.0, ts("2024-01-01"), "x"))  // cust FRANCE
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, 1L, 1L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ts("2024-03-15")), // FR→CA
      (2L, 1L, 1L, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", ts("2024-03-15")))  // FR→FR
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val out = Analytics.volumeShipping(li, os, cust, sup, nations,
      nationA = "FRANCE", nationB = "CANADA").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("supp_nation") == "FRANCE")
    assert(r.getAs[String]("cust_nation") == "CANADA")
    assert(r.getAs[Int]("l_year") == 2024)
    assert(r.getAs[Double]("revenue") == 100.0)
  }

  test("productProfit nets retail cost against discounted revenue") {
    val parts = Seq((1L, "vivid red metal", "B", "T", 1, 10.0),
      (2L, "plain blue thing", "B", "T", 1, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val sup = Seq((1L, "s1", 1, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val li = Seq(
      (1L, 1L, 1L, 1, 2.0, 100.0, 0.1, 0.0, "N", "O", ts("2024-03-15")),
      (1L, 2L, 1L, 1, 2.0, 999.0, 0.0, 0.0, "N", "O", ts("2024-03-15")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val out = Analytics.productProfit(li, orders, parts, sup, nation).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("nation") == "FRANCE")
    assert(r.getAs[Int]("o_year") == 2024)
    // revenue 100*0.9=90, cost 10*2=20 → 70; blue part excluded by pattern
    assert(r.getAs[Double]("profit") == 70.0)
  }

  test("medianOrderValue is exact on both the small-region and pruned paths") {
    // small path (cnt <= 1000): 3 orders, odd count → middle value
    val small = Analytics.medianOrderValue(orders, customer, nation, region).head
    assert(small.getAs[Double]("median_price") == 100.0)
    // pruned path (cnt > 1000): 2001 orders valued 1..2001 → median 1001;
    // also an even-count region (2000 rows → avg of 1000.0 and 1001.0)
    val big = (1 to 2001).map(i =>
      (i.toLong, 10L, "O", i.toDouble, ts("2024-01-01"), "1-URGENT")) ++
      (1 to 2000).map(i =>
        (10000L + i, 20L, "O", i.toDouble, ts("2024-01-01"), "2-HIGH"))
    val bigOrders = big.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val nation2 = Seq((1, "FRANCE", 0), (2, "CANADA", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region2 = Seq((0, "EUROPE"), (1, "AMERICA")).toDF("r_regionkey", "r_name")
    val cust2 = Seq((10L, "a", 1, 0.0, "BUILDING"), (20L, "b", 2, 0.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Analytics.medianOrderValue(bigOrders, cust2, nation2, region2)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("median_price")).toMap
    assert(out == Map("EUROPE" -> 1001.0, "AMERICA" -> 1000.5))
  }

  private def li(rows: (Long, Long, Long, Double, Double, Double, String)*) =
    rows.zipWithIndex.map { case ((ok, pk, sk, qty, px, disc, ship), i) =>
      (ok, pk, sk, i + 1, qty, px, disc, 0.0, "N", "O", ts(ship))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")

  private val suppliers = Seq((1L, "S1", 1, 100.0), (2L, "S2", 1, -5.0))
    .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  test("discountRevenueDelta keeps only the discount band inside the window") {
    val df = li(
      (1L, 1L, 1L, 10.0, 100.0, 0.06, "2024-02-01"),  // in band, in window
      (2L, 1L, 1L, 10.0, 100.0, 0.02, "2024-02-01"),  // discount below band
      (3L, 1L, 1L, 30.0, 100.0, 0.06, "2024-02-01"),  // quantity too large
      (4L, 1L, 1L, 10.0, 100.0, 0.06, "2025-02-01"))  // outside window
    val out = Analytics.discountRevenueDelta(df, "2024-01-01", "2025-01-01").head
    assert(out.getAs[Long]("n_lines") == 1L)
    assert(out.getAs[Double]("forecast_delta") == 6.0) // 100 * 0.06
  }

  test("marketShare is the conditional revenue fraction per year") {
    val df = li(
      (1L, 1L, 1L, 1.0, 100.0, 0.0, "2024-02-01"),   // target-nation supplier
      (2L, 1L, 2L, 1.0, 300.0, 0.0, "2024-03-01"))   // same nation here
    val supp2 = Seq((1L, "S1", 1, 0.0), (2L, "S2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nation2 = Seq((1, "FRANCE", 0), (2, "GERMANY", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val ord = Seq((1L, 10L, "O", 0.0, ts("2024-02-01"), "x"),
      (2L, 10L, "O", 0.0, ts("2024-03-01"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.marketShare(df, ord, customer, supp2, nation2, region,
      targetRegion = "EUROPE", targetNation = "FRANCE").head
    assert(out.getAs[Int]("o_year") == 2024)
    assert(out.getAs[Double]("mkt_share") == 0.25) // 100 / 400
    assert(out.getAs[Double]("total_revenue") == 400.0)
  }

  test("promoRevenuePct weighs promo-part revenue against the total") {
    val df = li(
      (1L, 1L, 1L, 1.0, 100.0, 0.0, "2024-02-01"),
      (2L, 2L, 1L, 1.0, 300.0, 0.0, "2024-02-01"))
    val part = Seq((1L, "n1", "Brand#1", "PROMO", 10, 1.0),
      (2L, "n2", "Brand#2", "STANDARD", 10, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val out = Analytics.promoRevenuePct(df, part, "2024-01-01", "2025-01-01").head
    assert(out.getAs[Long]("n_lines") == 2L)
    assert(out.getAs[Double]("promo_pct") == 25.0)
  }

  test("topSupplier returns every supplier tied at the max") {
    val df = li(
      (1L, 1L, 1L, 1.0, 200.0, 0.0, "2024-02-01"),
      (2L, 1L, 2L, 1.0, 200.0, 0.0, "2024-02-01"))
    val out = Analytics.topSupplier(df, suppliers, "2024-01-01", "2025-01-01")
      .orderBy("s_suppkey").collect()
    assert(out.length == 2) // exact-decimal tie keeps both
    assert(out.forall(_.getAs[Double]("total_revenue") == 200.0))
  }

  test("soleLateSupplier blames only the unique late supplier of multi-supplier orders") {
    val ord = Seq(
      (1L, 10L, "F", 0.0, ts("2024-01-01"), "x"),
      (2L, 10L, "F", 0.0, ts("2024-01-01"), "x"),
      (3L, 10L, "O", 0.0, ts("2024-01-01"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val df = li(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "2024-06-01"),  // late
      (1L, 1L, 2L, 1.0, 1.0, 0.0, "2024-01-15"),  // on time → order 1 blames S1
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "2024-06-01"),  // late
      (2L, 1L, 2L, 1.0, 1.0, 0.0, "2024-06-01"),  // both late → no blame
      (3L, 1L, 1L, 1.0, 1.0, 0.0, "2024-06-01"))  // status O → excluded
    val out = Analytics.soleLateSupplier(df, ord, suppliers, nation).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "S1")
    assert(out.head.getAs[Long]("n_waits") == 1L)
  }

  test("minCostSupplier compares exact integer micro-costs per part") {
    val df = li(
      (1L, 1L, 1L, 2.0, 100.0, 0.0, "2024-02-01"),  // S1: 10000/2 → 50 units
      (2L, 1L, 2L, 4.0, 100.0, 0.0, "2024-02-01"))  // S2: 10000/4 → 25 units
    val part = Seq((1L, "n1", "Brand#1", "PROMO", 15, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val out = Analytics.minCostSupplier(df, part, suppliers, nation, region).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("s_name") == "S2")
    assert(out.head.getAs[Long]("unit_cost_micro") == 25000000L) // 25.0 · 10⁶
  }

  test("partSupplierCounts excludes flagged suppliers and counts distinct") {
    val df = li(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "2024-02-01"),
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "2024-02-01"),  // dup (part, supp) pair
      (3L, 1L, 2L, 1.0, 1.0, 0.0, "2024-02-01"))  // S2 negative acctbal → excluded
    val part = Seq((1L, "n1", "Brand#2", "PROMO", 10, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val out = Analytics.partSupplierCounts(df, part, suppliers).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("supplier_cnt") == 1L)
  }

  test("basketAffinity computes exact integer-micro lift per type pair") {
    val part = Seq((1L, "x", "B", "PROMO", 1, 1.0), (2L, "y", "B", "SMALL", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val df = li(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "2024-01-01"), // order 1: PROMO + SMALL
      (1L, 2L, 1L, 1.0, 1.0, 0.0, "2024-01-01"),
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "2024-01-01")) // order 2: PROMO only
    val out = Analytics.basketAffinity(df, part).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("type_a") == "PROMO" && r.getAs[String]("type_b") == "SMALL")
    // lift = (1 both · 2 orders) / (2 PROMO · 1 SMALL) = 1.0 exactly
    assert(r.getAs[Long]("n_both") == 1L && r.getAs[Long]("lift_micro") == 1000000L)
  }

  test("seasonalityIndex is the exact flat-month-relative revenue share") {
    val ords = Seq(
      (1L, 10L, "O", 300.0, ts("2024-01-10"), "5-LOW"),
      (2L, 10L, "O", 100.0, ts("2024-02-10"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.seasonalityIndex(ords).orderBy("month").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("index_micro")).toMap
    // Jan = 3/4 of revenue → 12·0.75 = 9× a flat month; Feb = 3×
    assert(out == Map(1L -> 9000000L, 2L -> 3000000L))
  }

  test("cohortLtv accumulates exact cohort revenue by quarter offset") {
    val ords = Seq(
      (1L, 10L, "O", 100.0, ts("2024-01-15"), "5-LOW"), // cohort 2024-Q1
      (2L, 10L, "O", 50.0, ts("2024-05-01"), "5-LOW"),  // offset 1
      (3L, 20L, "O", 70.0, ts("2024-05-02"), "5-LOW"))  // cohort 2024-Q2
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.cohortLtv(ords)
      .orderBy("cohort_quarter", "quarter_offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_active"),
        r.getAs[Long]("cum_revenue_cents"))).toSeq
    assert(out == Seq(
      ("2024-Q1", 0L, 1L, 10000L),
      ("2024-Q1", 1L, 1L, 15000L), // cumulative 100 + 50 dollars
      ("2024-Q2", 0L, 1L, 7000L)))
  }

  test("orderValueDeciles assigns CDF deciles over dollar-quantized values") {
    val ords = (1 to 10).map(i =>
      (i.toLong, 10L, "O", i * 100.0 + 0.5, ts("2024-01-01"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.orderValueDeciles(ords).orderBy("decile").collect()
    assert(out.length == 10) // 10 distinct dollar values → one per decile
    assert(out.map(_.getAs[Long]("n_orders")).forall(_ == 1L))
    assert(out.head.getLong(0) == 1L && out.head.getAs[Long]("min_dollars") == 100L)
    assert(out.last.getLong(0) == 10L && out.last.getAs[Long]("max_dollars") == 1000L)
  }

  test("nationSupplierHhi is the exact integer-micro Herfindahl index") {
    val df = li(
      (1L, 1L, 1L, 3.0, 1.0, 0.0, "2024-01-01"),
      (2L, 1L, 2L, 1.0, 1.0, 0.0, "2024-01-01"))
    val supp = Seq((1L, "S1", 1, 0.0), (2L, "S2", 1, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val out = Analytics.nationSupplierHhi(df, supp, nation).collect()
    assert(out.length == 1)
    // shares 3/4 and 1/4 → HHI = 0.75² + 0.25² = 0.625
    assert(out.head.getAs[Long]("n_suppliers") == 2L)
    assert(out.head.getAs[Long]("hhi_micro") == 625000L)
    // monopoly → HHI exactly 10⁶
    val mono = Analytics.nationSupplierHhi(
      li((1L, 1L, 1L, 5.0, 1.0, 0.0, "2024-01-01")), supp, nation).collect()
    assert(mono.head.getAs[Long]("hhi_micro") == 1000000L)
  }

  test("latePriorityMix splits late line counts by priority class") {
    val ords = Seq(
      (1L, 10L, "O", 1.0, ts("2024-01-01"), "1-URGENT"),
      (2L, 10L, "O", 1.0, ts("2024-01-01"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val df = li(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "2024-03-01"),  // late, high priority
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "2024-01-05"),  // on time → dropped
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "2024-03-01"),  // late, low priority
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "2024-02-15"))  // late by 45d, low priority
    val out = Analytics.latePriorityMix(ords, df).collect()
    assert(out.length == 1) // every line has linestatus O in the fixture
    assert(out.head.getAs[Long]("high_line_count") == 1L)
    assert(out.head.getAs[Long]("low_line_count") == 2L)
  }

  test("excessShareSuppliers keeps only suppliers above the volume share") {
    val part = Seq((1L, "red widget", "B", "T", 1, 1.0),
      (2L, "blue bolt", "B", "T", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val df = li(
      (1L, 1L, 1L, 95.0, 1.0, 0.0, "2024-01-01"), // S1: 95/100 of red → kept
      (2L, 1L, 2L, 5.0, 1.0, 0.0, "2024-01-01"),  // S2: 5·8 < 100 → dropped
      (3L, 2L, 2L, 100.0, 1.0, 0.0, "2024-01-01")) // blue: not a promo part
    val out = Analytics.excessShareSuppliers(df, part, suppliers, nation).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("s_suppkey") == 1L)
    assert(out.head.getAs[String]("nation") == "FRANCE")
    assert(out.head.getAs[Long]("n_majority_parts") == 1L)
  }

  test("orderGapStats reports exact integer gap statistics per customer") {
    val ords = Seq(
      (1L, 10L, "O", 1.0, ts("2024-01-01"), "5-LOW"),
      (2L, 10L, "O", 1.0, ts("2024-01-04"), "5-LOW"),
      (3L, 10L, "O", 1.0, ts("2024-01-08"), "5-LOW"),
      (4L, 20L, "O", 1.0, ts("2024-01-01"), "5-LOW")) // single order → no gaps
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.orderGapStats(ords).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 10L && r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Long]("min_gap_days") == 3L)
    assert(r.getAs[Long]("max_gap_days") == 4L)
    assert(r.getAs[Long]("avg_gap_micro_days") == 3500000L) // (7·10⁶) div 2
  }

  test("shippingSlaPercentiles picks exact type-1 quantiles per priority") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // priority P: days 1..10 once each -> p50=5, p90=9, p99=10
    val orders = (1L to 10L).map(k => (k, t("2000-01-01"), "P"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lineitem = (1L to 10L).map(k => (k, t(f"2000-01-${k + 1}%02d")))
      .toDF("l_orderkey", "l_shipdate")
    val r = Analytics.shippingSlaPercentiles(lineitem, orders).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 9L, 10L, 10L)))
  }

  test("segmentMigrationMatrix tracks tier moves and churn, skips the last year") {
    import java.sql.Timestamp
    def t(y: Int) = Timestamp.valueOf(s"$y-06-01 00:00:00")
    // custom thresholds: LOW < 100 cents spend... use dollars: LOW<1, MID<2
    val orders = Seq(
      (1L, t(2000), 0.50), (1L, t(2001), 1.50),  // LOW -> MID
      (2L, t(2000), 2.50),                        // HIGH -> CHURNED (no 2001)
      (3L, t(2001), 0.50))                        // last year only: excluded
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val m = Analytics.segmentMigrationMatrix(orders,
      lowBelowCents = 100L, midBelowCents = 200L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(m == Map((2000L, "LOW", "MID") -> 1L,
      (2000L, "HIGH", "CHURNED") -> 1L))
  }

  test("windowedConversion counts only purchases within the deadline") {
    import java.sql.Timestamp
    def t(d: String) = Timestamp.valueOf(s"2000-01-$d 00:00:00")
    val ev = Seq(
      (1L, t("03"), 10L, "signup", 0.0, "{}"),   // Monday Jan 3
      (2L, t("05"), 10L, "purchase", 1.0, "{}"), // within 7d -> converted
      (3L, t("03"), 11L, "signup", 0.0, "{}"),
      (4L, t("20"), 11L, "purchase", 1.0, "{}"), // outside 7d
      (5L, t("04"), 12L, "signup", 0.0, "{}"))   // never purchases
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Analytics.windowedConversion(ev).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) ==
      ((3L, 1L, 333333L)))
  }

  test("newVsReturning splits first-month orders from later ones") {
    val o = Seq(
      (1L, 10L, 100.0, ts("2024-01-05")),  // cust 10 first month (2 orders)
      (2L, 10L, 50.0, ts("2024-01-20")),
      (3L, 10L, 70.0, ts("2024-02-10")),   // cust 10 returning
      (4L, 20L, 30.0, ts("2024-02-01")))   // cust 20 new in feb
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = Analytics.newVsReturning(o).orderBy("ym").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (202401L, 2L, 0L, 150.0, 0.0, 1000000L),
      (202402L, 1L, 1L, 30.0, 70.0, 500000L)))
  }

  test("hllMergeAudit merged daily sketches agree with exact distincts") {
    val events = Seq(
      (1L, 10L, "CLICK", 1.0, ts("2024-01-01")),
      (2L, 10L, "CLICK", 1.0, ts("2024-01-02")),  // same user, other day
      (3L, 20L, "CLICK", 1.0, ts("2024-01-02")),
      (4L, 30L, "VIEW", 1.0, ts("2024-01-01")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Analytics.hllMergeAudit(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("CLICK") == ((2L, true)))  // cross-day union dedups user 10
    assert(out("VIEW") == ((1L, true)))
  }

  test("orderValuePercentilesCont interpolates like percentile_cont") {
    val orders = Seq(
      (1L, 1L, "O", 1.0, ts("2024-01-01"), "P"),
      (2L, 1L, "O", 2.0, ts("2024-01-02"), "P"),
      (3L, 1L, "O", 3.0, ts("2024-01-03"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = Analytics.orderValuePercentilesCont(orders).collect().head
    assert(r.getLong(1) == 3L)
    // quantile_cont of [1,2,3]: p50 = 2.0, p90 = 1 + 1.8 = 2.8, p99 = 2.98
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 2.8 && r.getDouble(4) == 2.98)
  }

  test("rollingDistinctUsers unions trailing-window partials per day") {
    // day 1: users {10}, day 2: {10, 20}, day 9: {30} — the 7-day window
    // for day 2 covers days 1-2 (2 distinct), for day 9 only day 9 (1):
    // day 2's user 10 re-appearance must not double-count.
    val events = Seq(
      (1L, 10L, "CLICK", 1.0, ts("2024-01-01")),
      (2L, 10L, "CLICK", 1.0, ts("2024-01-02")),
      (3L, 20L, "CLICK", 1.0, ts("2024-01-02")),
      (4L, 30L, "VIEW", 1.0, ts("2024-01-09")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Analytics.rollingDistinctUsers(events).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 3) // only days with events report
    assert(out("2024-01-01") == ((1L, true)))
    assert(out("2024-01-02") == ((2L, true)))
    assert(out("2024-01-09") == ((1L, true))) // days 1-2 fell out of the window
  }

  test("rfmSegments scores against nearest-rank terciles and labels segments") {
    // 3 customers: #1 recent+frequent+big (champion), #2 middling,
    // #3 stale single small order (hibernating).
    val orders = Seq(
      (1L, 1L, "O", 1000.0, ts("2024-06-01"), "1-URGENT"),
      (2L, 1L, "O", 1000.0, ts("2024-06-02"), "1-URGENT"),
      (3L, 1L, "O", 1000.0, ts("2024-06-03"), "1-URGENT"),
      (4L, 2L, "O", 500.0, ts("2024-03-01"), "1-URGENT"),
      (5L, 2L, "O", 500.0, ts("2024-03-02"), "1-URGENT"),
      (6L, 3L, "O", 100.0, ts("2023-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.rfmSegments(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out("champion") == ((1L, 3L, 3000.0)))
    assert(out.contains("hibernating"))
    assert(out.values.map(_._1).sum == 3L)
  }

  test("spendDecileLift ties share a decile; shares and lift exact micro") {
    // 10 customers, one spends 10x the rest: top decile carries
    // 1000/1900 of revenue → lift ≈ 5.26x.
    val orders = ((1L to 9L).map(i => (i, i, 100.0)) :+ (10L, 10L, 1000.0))
      .map { case (k, c, p) => (k, c, "O", p, ts("2024-01-01"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.spendDecileLift(orders).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(1) == ((1L, 1000.0, 526315L, 5263157L)))
    // the nine tied customers all land in decile 2 (ties never split)
    assert(out(2) == ((9L, 900.0, 473684L, 526315L)))
    assert(out.size == 2)
  }

  test("equiDepthHistogram assigns whole distinct values to CDF buckets") {
    // 8 rows over 4 distinct prices; B=2 buckets of ~4 rows each.
    // Value 10.00 has 3 rows (start rank 0 → bucket 1), 20.00 has 3
    // (start rank 3, 3*2/8=0 → bucket 1), 30.00 starts at 6 → bucket 2,
    // 40.00 at 7 → bucket 2. Ties never split across buckets.
    val orders = (1L to 3L).map(i => (i, 10.0)) ++
      (4L to 6L).map(i => (i, 20.0)) ++ Seq((7L, 30.0), (8L, 40.0))
    val df = orders.toDF("o_orderkey", "o_totalprice")
    val out = Analytics.equiDepthHistogram(df, buckets = 2).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out(1) == ((10.0, 20.0, 6L, 2L)))
    assert(out(2) == ((30.0, 40.0, 2L, 2L)))
  }

  test("categoryGrowth reports exact YoY micro growth, null on gaps") {
    val li = Seq(
      (1L, 100L, 100.0, 0.0, ts("1995-03-01")),
      (2L, 100L, 150.0, 0.0, ts("1996-03-01")),  // +50% → 1_500_000
      (3L, 100L, 30.0, 0.0, ts("1998-03-01")))   // gap year → null base
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    val part = Seq((100L, "TYPE_A")).toDF("p_partkey", "p_type")
    val out = Analytics.categoryGrowth(li, part).orderBy("yr").collect()
      .map(r => (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1995L, 100.0, -1L), (1996L, 150.0, 1500000L), (1998L, 30.0, -1L)))
  }

  test("groupingSetsProfile: four explicit sets with the shared gid convention") {
    val region = Seq((1, "AMERICA"), (2, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((1, "US", 1), (2, "DE", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((1L, 1, "BUILDING"), (2L, 2, "AUTO"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val orders = Seq((1L, 1L, 100.0), (2L, 1L, 50.0), (3L, 2L, 200.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val got = Analytics.groupingSetsProfile(orders, customer, nation, region)
      .collect()
      .map(r => ((Option(r.getString(0)).getOrElse("-"),
        Option(r.getString(1)).getOrElse("-"), r.getLong(2)),
        (r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == 7)
    // gid 0: both grouped; 1: segment aggregated; 2: region aggregated;
    // 3: grand total — first grouping column is the MSB in BOTH engines
    assert(got(("AMERICA", "BUILDING", 0L)) == ((2L, 150.0)))
    assert(got(("EUROPE", "AUTO", 0L)) == ((1L, 200.0)))
    assert(got(("AMERICA", "-", 1L)) == ((2L, 150.0)))
    assert(got(("-", "AUTO", 2L)) == ((1L, 200.0)))
    assert(got(("-", "-", 3L)) == ((3L, 350.0)))
  }

  test("giniCustomerConcentration: exact values for equal and skewed spend") {
    import org.apache.spark.sql.functions.{col, to_date}
    def orders(rows: (Long, Long, Double)*) = rows
      .map { case (k, c, p) => (k, c, "1995-01-01", p) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    // perfectly equal spend → Gini 0
    val eq = Analytics.giniCustomerConcentration(
      orders((1L, 1L, 1.00), (2L, 2L, 1.00))).collect()(0)
    assert(eq.getAs[Long]("n_customers") == 2L)
    assert(eq.getAs[Long]("gini_micro") == 0L)
    // totals 100 vs 300 cents → Gini exactly 0.25
    val sk = Analytics.giniCustomerConcentration(
      orders((1L, 1L, 1.00), (2L, 2L, 3.00))).collect()(0)
    assert(sk.getAs[Long]("total_cents") == 400L)
    assert(sk.getAs[Long]("gini_micro") == 250000L)
  }

  test("amsF2UserActivity: collision-free small side collapses to exact F2") {
    // two users with 3 and 4 events: F2 = 9 + 16 = 25; with k=1024
    // buckets the md5 bucket hashes never collide for this pair in any
    // rep (deterministic), so every sketch estimate is exactly F2 and
    // the median error is 0
    val ev = (Seq.fill(3)(1L) ++ Seq.fill(4)(2L)).zipWithIndex
      .map { case (u, i) => (i.toLong, u, "click") }
      .toDF("event_id", "user_id", "event_type")
    val r = Analytics.amsF2UserActivity(ev).collect()(0)
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("f2_exact") == 25L)
    assert(r.getAs[Long]("ams_median_est") == 25L)
    assert(r.getAs[Long]("err_permille") == 0L)
    // null user_ids are excluded, not hashed into a bucket
    val withNull = ev.unionByName(Seq((99L, Option.empty[Long], "click"))
      .toDF("event_id", "user_id", "event_type"))
    assert(Analytics.amsF2UserActivity(withNull)
      .collect()(0).getAs[Long]("f2_exact") == 25L)
  }
}
