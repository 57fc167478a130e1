package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TrendOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("olsRevenueTrend recovers an exact linear trend") {
    // single region, revenue = 1000 + 250*t dollars for t = 0..11
    val orders = (0 until 12).flatMap { t =>
      val m = f"${t % 12 + 1}%02d"
      Seq((t.toLong, 1L, ts(s"1995-$m-15"), 1000.0 + 250.0 * t))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, 1)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((1, 1)).toDF("n_nationkey", "n_regionkey")
    val region = Seq((1, "R1")).toDF("r_regionkey", "r_name")
    val r = TrendOps.olsRevenueTrend(orders, customer, nation, region)
      .collect()(0)
    assert(r.getAs[String]("region") == "R1")
    assert(r.getAs[Long]("n_months") == 12L)
    assert(r.getAs[Double]("slope_cents_per_month") == 25000.0)
    assert(r.getAs[Double]("intercept_cents") == 100000.0)
  }

  test("acfDailyRevenue: alternating series gives exact ±1 autocorrelation") {
    // daily totals 1,2,1,2,... for 10 consecutive days: lag-1 pairs are
    // perfectly anti-correlated (r = −1 exactly), lag-2 perfectly
    // correlated (r = +1) — closed-form checks of the exact-integer path
    val orders = (0 until 10).map { i =>
      (i.toLong, ts(f"2000-01-${i + 1}%02d"), if (i % 2 == 0) 1.0 else 2.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.acfDailyRevenue(orders, maxLag = 3)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 9L, -1.0), (2L, 8L, 1.0), (3L, 7L, -1.0)))
  }

  test("acfDailyRevenue pairs skip calendar gaps") {
    // days 1,2,4: lag-1 pairs only (1→2); lag-2 only (2→4); lag-3 (1→4)
    val orders = Seq(
      (1L, ts("2000-01-01"), 10.0), (2L, ts("2000-01-02"), 20.0),
      (3L, ts("2000-01-04"), 30.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val n = TrendOps.acfDailyRevenue(orders, maxLag = 3)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSeq
    // single-pair lags have zero variance → acf is NULL (not NaN), the
    // engine-stable degenerate verdict
    assert(n == Seq((1L, 1L, true), (2L, 1L, true), (3L, 1L, true)))
  }

  test("holtForecast matches the direct recurrence; constant series is flat") {
    // linear series: 100, 110, ..., 180 dollars over 9 consecutive days
    val orders = (0 until 9).map { i =>
      (i.toLong, ts(f"2000-01-${i + 1}%02d"), 100.0 + 10.0 * i)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.holtForecast(orders).orderBy("d").collect()
    assert(out.length == 2) // first complete 8-obs window at day 8
    // direct recurrence in cents (dyadic values — doubles are exact)
    var l = 100.0 * 100; var b = 0.0
    for (i <- 1 to 7) {
      val y = (100.0 + 10.0 * i) * 100
      val l2 = (y + l + b) / 2; b = ((l2 - l) + b) / 2; l = l2
    }
    def r2(x: Double) = math.rint(x * 100) / 100
    val row = out.head
    assert(row.getDouble(2) == r2(l / 100))
    assert(row.getDouble(3) == r2(b / 100))
    assert(row.getDouble(4) == r2((l + b) / 100))
    assert(row.getDouble(5) == r2((l + 7 * b) / 100))
    // constant series: level = the constant, trend = 0, forecasts flat
    val const = (0 until 8).map { i =>
      (i.toLong, ts(f"2000-02-${i + 1}%02d"), 50.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val c = TrendOps.holtForecast(const).collect()
    assert(c.length == 1)
    assert(c.head.getDouble(2) == 50.0 && c.head.getDouble(3) == 0.0 &&
      c.head.getDouble(5) == 50.0)
  }

  test("orderBacklogTimeline sweeps opens and last-ship closes") {
    val orders = Seq(
      (1L, ts("2000-01-01"), 10.0), (2L, ts("2000-01-01"), 10.0),
      (3L, ts("2000-01-02"), 10.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    // order 1 ships over two days (closes on the LAST), order 2 never
    // ships (stays open), order 3 ships same-day
    val lineitem = Seq(
      (1L, ts("2000-01-02")), (1L, ts("2000-01-03")), (3L, ts("2000-01-02")))
      .toDF("l_orderkey", "l_shipdate")
    val out = TrendOps.orderBacklogTimeline(orders, lineitem)
      .orderBy("d").collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("2000-01-01") == ((2L, 0L, 2L)))
    assert(out("2000-01-02") == ((1L, 1L, 2L))) // order 3 opens AND closes
    assert(out("2000-01-03") == ((0L, 1L, 1L))) // order 2 remains forever
  }

  test("dailyGapfill zero-fills missing days and forward-fills averages") {
    val orders = Seq(
      (1L, ts("2000-01-01"), 10.0),
      (2L, ts("2000-01-01"), 20.0),
      (3L, ts("2000-01-04"), 40.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.dailyGapfill(orders).orderBy("d").collect()
    assert(out.length == 4) // Jan 1-4 inclusive
    val byDay = out.map(r => r.getDate(0).toString ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byDay("2000-01-01") == ((2L, 30.0, 15.0)))
    assert(byDay("2000-01-02") == ((0L, 0.0, 15.0))) // gap: ffilled avg
    assert(byDay("2000-01-03") == ((0L, 0.0, 15.0)))
    assert(byDay("2000-01-04") == ((1L, 40.0, 40.0)))
  }

  test("revenueStreaks finds consecutive above-mean runs, splits on gaps") {
    // days 1-2 high, day 3 low, days 5-7 high (calendar gap at day 4):
    // mean = (200+200+40+200+200+200)/6 = 173.33 → highs are above
    val orders = Seq(
      (1L, ts("2000-01-01"), 200.0), (2L, ts("2000-01-02"), 200.0),
      (3L, ts("2000-01-03"), 40.0), (4L, ts("2000-01-05"), 200.0),
      (5L, ts("2000-01-06"), 200.0), (6L, ts("2000-01-07"), 200.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.revenueStreaks(orders).orderBy("rnk").collect()
      .map(r => (r.getDate(0).toString, r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2000-01-05", "2000-01-07", 3L, 1L, 600.0),
      ("2000-01-01", "2000-01-02", 2L, 2L, 400.0)))
  }

  test("changepointCusum peaks at the level-shift boundary") {
    // 3 days at $100 then 3 days at $200: |CUSUM| must peak on day 3,
    // the last day of the old regime
    val orders = Seq(
      (1L, ts("2000-01-01"), 100.0), (2L, ts("2000-01-02"), 100.0),
      (3L, ts("2000-01-03"), 100.0), (4L, ts("2000-01-04"), 200.0),
      (5L, ts("2000-01-05"), 200.0), (6L, ts("2000-01-06"), 200.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.changepointCusum(orders).orderBy("rnk").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(3)))
    assert(out.length == 6)
    // n·prefix − t·S at day 3 = 6·30000 − 3·90000 = −90000 cents → /n/100
    assert(out.head == (("2000-01-03", 1L, -150.0)))
    // days 2 and 4 tie at −60000; earlier date wins the tiebreak
    assert(out(1) == (("2000-01-02", 2L, -100.0)))
    assert(out(2) == (("2000-01-04", 3L, -100.0)))
    // the full-span CUSUM closes at zero on the last day
    assert(out.last == (("2000-01-06", 6L, 0.0)))
  }

  test("ewmaDailyRevenue renormalizes the series head and weights recency") {
    val orders = Seq(
      (1L, ts("2000-01-01"), 100.0),
      (2L, ts("2000-01-02"), 200.0),
      (3L, ts("2000-01-03"), 400.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.ewmaDailyRevenue(orders).orderBy("d").collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(2), r.getDouble(3))).toMap
    // day 1: only itself → ewma == revenue (head renormalization)
    assert(out("2000-01-01") == ((100.0, 100.0)))
    // day 2: (200·128 + 100·64) / (128 + 64) = 166.67
    assert(out("2000-01-02") == ((200.0, 166.67)))
    // day 3: (400·128 + 200·64 + 100·32) / (128+64+32) = 300.0
    assert(out("2000-01-03") == ((400.0, 300.0)))
  }

  test("rollingAnomalyFlags judges each event against prior history only") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d")
    // 30 alternating values (zero-mean-drift, small variance), then a spike
    // and a normal value: only the spike flags; early rows lack history
    val rows = (0 until 30).map(i =>
      (i.toLong, "CLICK", if (i % 2 == 0) 99.0 else 101.0, t(i))) ++
      Seq((30L, "CLICK", 150.0, t(30)),   // dev²=2.25e10 > 9·(nQ−S²)=8.1e7
          (31L, "CLICK", 101.0, t(31)),   // dev within band
          (32L, "VIEW", 500.0, t(32)))    // different type, no history
    val events = rows.toDF("event_id", "event_type", "value", "ts")
    val out = TrendOps.rollingAnomalyFlags(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(5L) == ((5L, false)))     // n_prior < 30 never flags
    assert(out(30L) == ((30L, true)))    // the spike
    assert(out(31L) == ((31L, false)))   // post-spike normal value
    assert(out(32L) == ((0L, false)))    // fresh key
  }

  test("rollingAnomalyFlags prefix statistics carry across day segments") {
    // the two-level day decomposition must accumulate history over the
    // day boundary exactly: 30 calm values on day 1, the spike on day 3
    def t(d: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-0$d 00:${i / 60}%02d:${i % 60}%02d")
    val rows = (0 until 30).map(i =>
      (i.toLong, "CLICK", if (i % 2 == 0) 99.0 else 101.0, t(1, i))) ++
      Seq((30L, "CLICK", 100.0, t(2, 0)),  // day 2: within band
          (31L, "CLICK", 150.0, t(3, 0)))  // day 3: spike vs 31 priors
    val events = rows.toDF("event_id", "event_type", "value", "ts")
    val out = TrendOps.rollingAnomalyFlags(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(30L) == ((30L, false)))   // sees all 30 day-1 priors
    assert(out(31L) == ((31L, true)))    // sees days 1+2 and flags
  }

  test("orderArrivalDispersion: exact Fano factor, degenerate guard") {
    // daily counts {1, 3}: n=2, S=4, Q=10 → F = (2·10 − 16)/(4·1) = 1.0
    val orders = Seq(
      (1L, ts("2000-01-01"), 10.0), (2L, ts("2000-01-02"), 10.0),
      (3L, ts("2000-01-02"), 10.0), (4L, ts("2000-01-02"), 10.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = TrendOps.orderArrivalDispersion(orders).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3)) == ((2L, 4L, 2000L, 1000000L)))
    // constant arrivals → zero variance → F = 0
    val flat = Seq((1L, ts("2000-01-01"), 10.0), (2L, ts("2000-01-02"), 10.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    assert(TrendOps.orderArrivalDispersion(flat)
      .collect()(0).getLong(3) == 0L)
    // a single day (or empty) history yields no row, not a div-by-zero
    assert(TrendOps.orderArrivalDispersion(flat.limit(1)).count() == 0)
    assert(TrendOps.orderArrivalDispersion(flat.limit(0)).count() == 0)
  }

  test("ccfOrdersRevenue: perfect linear co-movement, lag coverage, NULL guard") {
    // day i carries i orders of $10 each: m = i and y = 1000·i cents are
    // both linear in the day index, so every lag with ≥2 pairs has r = 1
    val orders = (1 to 5).flatMap(i => (0 until i).map(j =>
      ((i * 100 + j).toLong, ts(f"2000-01-0$i%d"), 10.0)))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.ccfOrdersRevenue(orders).collect()
      .map(r => r.getLong(0) -> r).toMap
    // 5 days → pairs exist only for |lag| ≤ 4 (9 rows of the 15 lags)
    assert(out.keySet == (-4L to 4L).toSet)
    assert(out(0L).getLong(1) == 5L && out(0L).getDouble(2) == 1.0)
    assert(out(3L).getLong(1) == 2L && out(3L).getDouble(2) == 1.0)
    // |lag| = 4 leaves a single pair → zero variance → NULL, never NaN
    assert(out(4L).isNullAt(2) && out(-4L).isNullAt(2))
    // anti-monotone: revenue falls as order count rises → r = −1 at lag 0
    val down = (1 to 5).flatMap { i =>
      (0 until i).map(j =>
        ((i * 100 + j).toLong, ts(f"2000-01-0$i%d"), 10.0 * (6 - i) / i))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val d0 = TrendOps.ccfOrdersRevenue(down).collect()
      .find(_.getLong(0) == 0L).get
    assert(d0.getDouble(2) == -1.0)
  }

  test("weekdayRevenueEnvelope and weekdayOutlierDays: exact per-dow order stats") {
    // Mondays (dow 1): $1 ×4 days + one $10 spike; Tuesdays: $1/$2/$3
    val orders = (Seq("01", "08", "15", "22").map(d => (s"2024-01-$d", 1.0))
      ++ Seq(("2024-01-29", 10.0),
        ("2024-01-02", 1.0), ("2024-01-09", 2.0), ("2024-01-16", 3.0)))
      .zipWithIndex.map { case ((d, v), i) => (i.toLong, ts(d), v) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val env = TrendOps.weekdayRevenueEnvelope(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // Monday: n=5, P10=P50=100c, P90 catches the spike
    assert(env(1L) == ((5L, 100L, 100L, 1000L)))
    // Tuesday: type-1 quantiles of {100,200,300}
    assert(env(2L) == ((3L, 100L, 200L, 300L)))
    val out = TrendOps.weekdayOutlierDays(orders).collect()
    // Monday MAD = 0 (majority identical) → the spike still flags via
    // the dev > 0 degenerate rule; Tuesday MAD = 100 → nothing beyond 3×
    assert(out.length == 1)
    val r = out(0)
    assert(r.getDate(0).toString == "2024-01-29")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((1L, 1000L, 100L, 0L, 900L)))
  }

  test("changepointSingleSplit: exact argmax with earliest-date tie-break") {
    // level shift after day 3: {100,100,100 | 200,200} →
    // gain = 300²/3 + 400²/2 − 700²/5 = 12000 cents² = 1.2 usd²
    val shift = Seq(
      (1L, ts("2024-01-01"), 1.0), (2L, ts("2024-01-02"), 1.0),
      (3L, ts("2024-01-03"), 1.0), (4L, ts("2024-01-04"), 2.0),
      (5L, ts("2024-01-05"), 2.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = TrendOps.changepointSingleSplit(shift).collect()(0)
    assert(r.getDate(0).toString == "2024-01-03")
    assert((r.getLong(1), r.getLong(2)) == ((3L, 2L)))
    assert(r.getLong(3) == 100000000L && r.getLong(4) == 200000000L)
    assert(r.getAs[Double]("gain_usd2_r2") == 1.2)
    // constant series → every split gains 0 → earliest date wins
    val const = (1 to 4).map(i => (i.toLong, ts(f"2024-01-0$i%d"), 5.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val rc = TrendOps.changepointSingleSplit(const).collect()(0)
    assert(rc.getDate(0).toString == "2024-01-01")
    assert(rc.getAs[Double]("gain_usd2_r2") == 0.0)
    // a single day has no valid split → empty result, not an error
    assert(TrendOps.changepointSingleSplit(const.limit(0)).count() == 0)
  }

  test("pacfDailyRevenue: hand-unrolled Levinson on an alternating series") {
    // y = 100,200,100,200 cents over 4 consecutive days:
    // ρ1 = −3/4, ρ2 = 1/2, ρ3 = −1/4 (exact A_k/A_0 fractions);
    // φ11 = −0.75; φ22 = (ρ2−ρ1²)/(1−ρ1²) = −1/7; φ21 = −6/7;
    // φ33 = (ρ3 − (φ21ρ2 + φ22ρ1)) / E2 = (1/14)/(3/7) = 1/6;
    // lags 4..7 have no pairs → NULL
    val orders = Seq(
      (1L, ts("2024-01-01"), 1.0), (2L, ts("2024-01-02"), 2.0),
      (3L, ts("2024-01-03"), 1.0), (4L, ts("2024-01-04"), 2.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.pacfDailyRevenue(orders).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(out.keySet == (1L to 7L).toSet)
    assert(out(1L).contains(-0.75))
    assert(out(2L).contains(-0.142857))
    assert(out(3L).contains(0.166667))
    assert((4L to 7L).forall(out(_).isEmpty))
    // constant series → zero variance → NULL at every order
    val const = (1 to 5).map(i => (i.toLong, ts(f"2024-01-0$i%d"), 3.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    assert(TrendOps.pacfDailyRevenue(const).collect()
      .forall(_.isNullAt(1)))
  }

  test("medianPolishWeekday: hand-unrolled two sweeps isolate the anomaly cell") {
    // 2×2 grid (two weeks × Mon/Tue): $1 $2 / $3 $10.
    // sweep1 rows (lower medians 100, 300) → {0,100},{0,700}; cols
    // (Mon 0, Tue lower-med(100,700)=100) → Tue {0,600}; sweep2 all-0
    // medians change nothing. Decomposition: re={100,300}, ce={0,100},
    // the only nonzero residual is 600 at (w2, Tue).
    val orders = Seq(
      (1L, ts("2024-01-01"), 1.0), (2L, ts("2024-01-02"), 2.0),
      (3L, ts("2024-01-08"), 3.0), (4L, ts("2024-01-09"), 10.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = TrendOps.medianPolishWeekday(orders).collect()
    assert(out.length == 4)
    // first row is the anomaly cell (largest |residual|)
    val top = out(0)
    assert(top.getDate(0).toString == "2024-01-09")
    assert(top.getAs[Long]("residual_cents") == 600L)
    assert(top.getAs[Long]("week_effect_cents") == 300L)
    assert(top.getAs[Long]("dow_effect_cents") == 100L)
    // additive identity holds on every cell: y = week + dow + residual
    out.foreach { c =>
      assert(c.getAs[Long]("revenue_cents") ==
        c.getAs[Long]("week_effect_cents") +
          c.getAs[Long]("dow_effect_cents") +
          c.getAs[Long]("residual_cents"))
    }
    assert(out.count(_.getAs[Long]("residual_cents") != 0L) == 1)
  }

  test("revenueDiscords finds the anomalous week, exact vs brute force") {
    // 40 consecutive days of flat $100 revenue except days 15..21 at
    // $500 — the fully-anomalous window is the top discord
    val rev = (0 until 40).map(t => t ->
      (if (t >= 15 && t <= 21) 50000L else 10000L)).toMap
    val d0 = java.time.LocalDate.parse("1995-01-01")
    val orders = rev.toSeq.map { case (t, cents) =>
      (t.toLong, 1L, Timestamp.valueOf(d0.plusDays(t).atStartOfDay()),
        cents / 100.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    // brute force on the same integers
    def ssd(i: Int, j: Int): BigInt = (0 until 7)
      .map(k => BigInt(rev(i + k) - rev(j + k)).pow(2)).sum
    val starts = 0 to 33
    val mp = starts.map(i => i ->
      starts.filter(j => math.abs(j - i) >= 7).map(j => ssd(i, j)).min).toMap
    val expectTop = starts.sortBy(i => (-mp(i), i)).take(5)
    def isqrt(x: BigInt): Long = {
      var s = BigInt(math.sqrt(x.toDouble).toLong)
      while ((s + 1) * (s + 1) <= x) s += 1
      while (s * s > x) s -= 1
      s.toLong
    }
    val out = TrendOps.revenueDiscords(orders).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.map(_._1).toSeq == expectTop.map(_.toLong + 1096L),
      s"top starts ${out.map(_._1).toSeq} (t is days since 1992-01-01)")
    assert(out.map(_._2).toSeq == expectTop.map(i => isqrt(mp(i))))
    // the fully-anomalous window leads
    assert(out.head._1 == 15L + 1096L)
  }
}
