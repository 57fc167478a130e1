package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, to_date}

class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("theilSenTrend: exact slope, untouched by one massive outlier") {
    // days 1..9 linear at +5 dollars/day (every linear pair's slope is
    // exactly 500 cents/day), day 10 a 100k outlier: its 9 pairs all
    // have larger slopes, so ranks 1..36 of 45 still sit on the linear
    // slope and BOTH central order statistics (rank 23) are exact.
    val orders = ((1 to 9).map { t =>
      (t.toLong, ts(f"2000-01-$t%02d"), 100.0 + 5.0 * t)
    } :+ ((10L, ts("2000-01-10"), 100000.0)))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = StatOps.theilSenTrend(orders).collect()(0)
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Long]("n_pairs") == 45L)
    assert(r.getAs[Long]("slope_lo_micro") == 500000000L)
    assert(r.getAs[Long]("slope_hi_micro") == 500000000L)
    assert(r.getAs[Double]("sen_slope_cents_per_day") == 500.0)
  }

  test("theilSenTrend: negative slopes floor on the magnitude (sign branch)") {
    // two days, revenue FALLS by 1 cent over 3 days: slope = -1/3 cent
    // per day → magnitude floor((1*1e6)/3) = 333333, negated — not the
    // floor(-333333.3) = -333334 a naive floor-div would give.
    val orders = Seq(
      (1L, ts("2000-01-01"), 10.00), (2L, ts("2000-01-04"), 9.99))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = StatOps.theilSenTrend(orders).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Long]("slope_lo_micro") == -333333L)
    assert(r.getAs[Long]("slope_hi_micro") == -333333L)
  }

  test("ksOrderDrift: hand-computed sup over dollar-quantized CDFs") {
    // early usd {10,20,30}, late usd {30,40}: diffs |n2·ca − n1·cb| over
    // the grid are 2,4,3,0 → D at usd=20, d_micro = 4e6/(3·2)
    val orders = Seq(
      (1L, ts("1997-01-01"), 10.5), (2L, ts("1997-02-01"), 20.5),
      (3L, ts("1997-03-01"), 30.5), (4L, ts("1999-01-01"), 30.2),
      (5L, ts("1999-02-01"), 40.2))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = StatOps.ksOrderDrift(orders).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_early") == 3L)
    assert(r(0).getAs[Long]("n_late") == 2L)
    assert(r(0).getAs[Long]("ks_at_usd") == 20L)
    assert(r(0).getAs[Long]("d_micro") == 666666L)
  }

  test("ksOrderDrift: identical halves have zero drift") {
    val orders = (1 to 4).map { i =>
      (i.toLong, ts(if (i <= 2) "1997-01-01" else "1999-01-01"), 25.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = StatOps.ksOrderDrift(orders).collect()(0)
    assert(r.getAs[Long]("d_micro") == 0L)
  }

  test("priorityMixShift: exact floor(1000·rt·ct/n) expectations") {
    // A: 3 early + 1 late, B: 1 early + 3 late (n=8, rt=4, ct=4):
    // every cell expects 2000 milli; deviations ±1000
    val rows = Seq.fill(3)(("A", "1997-06-01")) ++ Seq(("A", "1999-06-01")) ++
      Seq(("B", "1997-06-01")) ++ Seq.fill(3)(("B", "1999-06-01"))
    val orders = rows.zipWithIndex.map { case ((p, d), i) =>
      (i.toLong, ts(d), p)
    }.toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val got = StatOps.priorityMixShift(orders).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      ("A", "early", 3L, 2000L, 1000L), ("A", "late", 1L, 2000L, -1000L),
      ("B", "early", 1L, 2000L, -1000L), ("B", "late", 3L, 2000L, 1000L)))
  }

  test("revenueMotifs: ascending 8-day series yields the six staircase motifs") {
    // distinct ascending revenues over 8 consecutive days: the CDF
    // quartiles are days (1,2|3,4|5,6|7,8) → symbols 1,1,2,2,3,3,4,4 →
    // exactly the six staircase 3-grams, once each.
    val orders = (1 to 8).map { t =>
      (t.toLong, ts(f"2000-01-$t%02d"), 100.0 * t)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = StatOps.revenueMotifs(orders).collect()
      .map(r => (r.getAs[String]("motif"), r.getAs[Long]("n_windows"))).toSet
    assert(out == Set("112" -> 1L, "122" -> 1L, "223" -> 1L,
      "233" -> 1L, "334" -> 1L, "344" -> 1L))
  }

  test("revenueMotifs: windows never span calendar gaps") {
    // days 1,2,3 then 5,6,7: only two complete consecutive triples
    val orders = Seq(1, 2, 3, 5, 6, 7).map { t =>
      (t.toLong, ts(f"2000-01-$t%02d"), 100.0 * t)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    assert(StatOps.revenueMotifs(orders).collect()
      .map(_.getAs[Long]("n_windows")).sum == 2L)
  }

  test("bootstrapCiOrderValue matches a direct hash-weight replication") {
    val orders = (1 to 30).map(i => (i.toLong, i * 10.0))
      .toDF("o_orderkey", "o_totalprice")
    val out = StatOps.bootstrapCiOrderValue(orders, resamples = 64).collect()(0)
    // independent replication: one md5-prefix hash per key, then the
    // universal-hash micro-uniform per resample → Poisson(1) inverse-CDF
    // weights → per-resample exact integer micro means → order stats
    import graft.functions.HashFns.{minhashA, minhashB, MinhashP}
    def h32(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    val thr = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)
    def w(u: Long): Long = thr.indexWhere(u < _) match {
      case -1 => 7L
      case k => k.toLong
    }
    def weight(key: Long, r: Int): Long = {
      val x = h32(s"bs:$key")
      w(((minhashA(r) * x + minhashB(r)) % MinhashP) * 1000000L / MinhashP)
    }
    val ys = (1 to 30).map(i => (i.toLong, i * 1000L))
    val means = (0 until 64).map { r =>
      val ws = ys.map { case (k, y) => (weight(k, r), y) }
      val sw = ws.map(_._1).sum
      (ws.map { case (wi, y) => wi * y }.sum * 1000000L) / sw
    }.sorted
    assert(out.getAs[Long]("n_orders") == 30L)
    assert(out.getAs[Long]("n_resamples") == 64L)
    assert(out.getAs[Long]("mean_micro") == ys.map(_._2).sum * 1000000L / 30L)
    assert(out.getAs[Long]("ci_lo_micro") == means(3))
    assert(out.getAs[Long]("ci_hi_micro") == means(60))
    assert(out.getAs[Long]("ci_lo_micro") <= out.getAs[Long]("ci_hi_micro"))
  }

  test("rankCorrQualityLength: a perfectly concordant pair scores τ-b = 1") {
    // doc 1: 50 tokens stop-rich → score 0.8 → x = 16; 199 chars → y = 7.
    // doc 2: 25 tokens no stops → score 0.4 → x = 8; 117 chars → y = 6.
    // One untied concordant pair: C=1, D=0, no ties → τ-b exactly 1.
    val df = Seq(
      (1L, Seq.fill(25)("the cat").mkString(" "), "en", "s", 199L),
      (2L, (Seq.fill(6)("fox wolf bear lynx") :+ "elk").mkString(" "),
        "en", "s", 117L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = StatOps.rankCorrQualityLength(df).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_x_bins") == 2L)
    assert(r.getAs[Long]("n_y_bins") == 2L)
    assert(r.getAs[Double]("tau_b_r6") == 1.0)
  }

  test("rankCorrQualityLength: all-tied input yields NULL, not a crash") {
    val df = Seq(
      (1L, "same words here", "en", "s", 15L),
      (2L, "same words here", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = StatOps.rankCorrQualityLength(df).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.isNullAt(r.fieldIndex("tau_b_r6")))
  }

  test("mannWhitneyU: doubled midrank identity on a hand-checked sample") {
    // A (discounted): 10.00, 20.00; B: 15.00 → ranks 1,3 vs 2
    // 2R_A = 8 → 2U_A = 8 − 2·3 = 2, 2U_B = 2·2·1 − 2 = 2, AUC = 0.5
    val li = Seq(
      (1L, 10.00, 0.05), (2L, 20.00, 0.10), (3L, 15.00, 0.00))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val r = StatOps.mannWhitneyU(li).collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 1L)
    assert(r.getAs[Long]("u2_a") == 2L && r.getAs[Long]("u2_b") == 2L)
    assert(r.getAs[Long]("auc_micro") == 500000L)
  }

  test("mannWhitneyU: tie-heavy sample uses midranks exactly") {
    // A: [10, 10], B: [10] → all tied at doubled midrank 2·2=4
    // 2R_A = 8 → 2U_A = 8 − 6 = 2 = n_a·n_b → AUC exactly 0.5
    val li = Seq(
      (1L, 10.00, 0.05), (2L, 10.00, 0.10), (3L, 10.00, 0.00))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val r = StatOps.mannWhitneyU(li).collect()(0)
    assert(r.getAs[Long]("u2_a") == 2L && r.getAs[Long]("auc_micro") == 500000L)
  }

  test("kendallTauDaily: concordant/discordant/tie census on three days") {
    // day1: y=100 m=1; day2: y=200 m=2; day3: y=150 m=1
    // (1,2) conc; (1,3) m-tie; (2,3) both fall → conc; τ_a = 2/3
    val orders = Seq(
      (1L, "1995-01-01", 1.00),
      (2L, "1995-01-02", 1.00), (3L, "1995-01-02", 1.00),
      (4L, "1995-01-03", 1.50))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val r = StatOps.kendallTauDaily(orders).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_concordant") == 2L)
    assert(r.getAs[Long]("n_discordant") == 0L)
    assert(r.getAs[Long]("n_ties_count") == 1L)
    assert(r.getAs[Long]("tau_a_micro") == 666666L)
  }

  test("hodgesLehmannDaily: median of Walsh averages, hand-checked") {
    // daily cents 100, 200, 400 → Walsh 2·avg set {200,300,400,500,600,
    // 800}; even m → central pair (400, 500) → HL = 225 cents
    val orders = Seq(
      (1L, "1995-01-01", 1.00), (2L, "1995-01-02", 2.00),
      (3L, "1995-01-03", 4.00))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val r = StatOps.hodgesLehmannDaily(orders).collect()(0)
    assert(r.getAs[Long]("n_days") == 3L && r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("hl2_lo_cents") == 400L)
    assert(r.getAs[Long]("hl2_hi_cents") == 500L)
    assert(r.getAs[Long]("hl_milli_dollars") == 2250L)
    // one massive outlier day barely moves it (robustness): mean would
    // jump to ~25 dollars, HL stays near the bulk
    val out = StatOps.hodgesLehmannDaily(orders.unionByName(
      Seq((4L, "1995-01-04", 93.00))
        .toDF("o_orderkey", "o_orderdate", "o_totalprice")
        .withColumn("o_orderdate", to_date(col("o_orderdate"))))).collect()(0)
    assert(out.getAs[Long]("hl_milli_dollars") <= 3500L,
      s"HL must resist the outlier, got ${out.getAs[Long]("hl_milli_dollars")}")
  }

  test("runsTestDaily: alternating series counts the maximum run count") {
    // daily y: 100, 300, 120, 400 → lower median 120; signs 0,1,0,1
    // → 4 runs; expected = 1000 + (2000·2·2) div 4 = 3000 milli
    val orders = Seq(
      (1L, "1995-01-01", 1.00), (2L, "1995-01-02", 3.00),
      (3L, "1995-01-03", 1.20), (4L, "1995-01-04", 4.00))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val r = StatOps.runsTestDaily(orders).collect()(0)
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("n_above") == 2L && r.getAs[Long]("n_below") == 2L)
    assert(r.getAs[Long]("n_runs") == 4L)
    assert(r.getAs[Long]("expected_runs_milli") == 3000L)
  }

  test("spearmanDaily: monotone ±1, ties midranked, constant leg → NULL") {
    // revenue strictly increases with order count → ρ = 1 exactly
    def day(i: Int, orders: Int) = (0 until orders).map(j =>
      ((i * 100 + j).toLong, f"1995-01-${i}%02d", 10.0 * i))
    val up = (1 to 5).flatMap(i => day(i, i))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val r1 = StatOps.spearmanDaily(up).collect()(0)
    assert(r1.getAs[Long]("n_days") == 5L)
    assert(r1.getAs[Double]("rho_r6") == 1.0)
    // revenue decreases as count increases → ρ = −1
    val down = (1 to 5).flatMap { i =>
      (0 until i).map(j =>
        ((i * 100 + j).toLong, f"1995-01-${i}%02d", 10.0 * (6 - i) / i))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    assert(StatOps.spearmanDaily(down).collect()(0)
      .getAs[Double]("rho_r6") == -1.0)
    // constant order count per day → zero variance → NULL, never NaN
    val const = (1 to 4).map(i => (i.toLong, f"1995-01-${i}%02d", 10.0 * i))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val r3 = StatOps.spearmanDaily(const).collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("rho_r6")))
  }

  test("priorityStatusCramersV: perfect association 1, independence 0") {
    def rows(p: String, s: String, n: Int, base: Long) =
      (0 until n).map(j => (base + j, p, s))
    // each priority maps to its own status → V = 1 (φ² = min(r,c) − 1)
    val perfect = (rows("1-URGENT", "F", 5, 0L) ++ rows("2-HIGH", "O", 5, 100L))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
    val r1 = StatOps.priorityStatusCramersV(perfect).collect()(0)
    assert(r1.getAs[Long]("phi2_micro") == 1000000L)
    assert(r1.getAs[Double]("cramers_v_r6") == 1.0)
    // balanced independent grid → φ² = 0, V = 0
    val indep = (rows("1-URGENT", "F", 3, 0L) ++ rows("1-URGENT", "O", 3, 100L)
      ++ rows("2-HIGH", "F", 3, 200L) ++ rows("2-HIGH", "O", 3, 300L))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
    val r2 = StatOps.priorityStatusCramersV(indep).collect()(0)
    assert(r2.getAs[Long]("phi2_micro") == 0L)
    assert(r2.getAs[Double]("cramers_v_r6") == 0.0)
    // a single status column (min(r,c) = 1) → V undefined (NULL)
    val degen = (rows("1-URGENT", "F", 2, 0L) ++ rows("2-HIGH", "F", 2, 100L))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
    val r3 = StatOps.priorityStatusCramersV(degen).collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("cramers_v_r6")))
  }

  test("levenePriorityDispersion: spread difference detected, equal spread → W = 0") {
    def orders(rows: Seq[(String, Double)]) = rows.zipWithIndex.map {
      case ((p, usd), i) => (i.toLong, p, usd)
    }.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    // URGENT has zero spread, LOW spreads ±5 around the same median
    val mixed = orders(Seq(("1-URGENT", 10.0), ("1-URGENT", 10.0),
      ("1-URGENT", 10.0), ("5-LOW", 5.0), ("5-LOW", 10.0), ("5-LOW", 15.0)))
    val out = StatOps.levenePriorityDispersion(mixed).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("1-URGENT").getLong(2) == 10L) // exact lower medians
    assert(out("5-LOW").getLong(2) == 10L)
    assert(out("1-URGENT").getLong(3) == 0L) // zero mean |dev|
    assert(out("5-LOW").getLong(3) == 3333333L) // ⌊10/3·10⁶⌋
    assert(out.values.map(_.getDouble(4)).toSet.size == 1) // shared W
    assert(out("5-LOW").getDouble(4) > 1.0) // dispersion differs
    // identical spreads at shifted locations → between-group term 0
    val equal = orders(Seq(("1-URGENT", 5.0), ("1-URGENT", 10.0),
      ("1-URGENT", 15.0), ("5-LOW", 105.0), ("5-LOW", 110.0),
      ("5-LOW", 115.0)))
    assert(StatOps.levenePriorityDispersion(equal).collect()
      .forall(_.getDouble(4) == 0.0))
    // one group → k = 1 → W undefined (NULL)
    val one = orders(Seq(("1-URGENT", 5.0), ("1-URGENT", 9.0)))
    val r1 = StatOps.levenePriorityDispersion(one).collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("bf_w_r6")))
  }

  test("jackknifeNationRevenue: exact LOO replicates and hand-checked SE") {
    val nation = Seq((0, "A"), (1, "B")).toDF("n_nationkey", "n_name")
    val customer = Seq((10L, 0), (11L, 1)).toDF("c_custkey", "c_nationkey")
    // one $10 order in A, one $20 in B: drop A → mean 2000 cents
    // (loo 2·10⁹ µcents), drop B → 10⁹; SE = √(½·(5e8²+5e8²))/10⁶ = 500
    val orders = Seq((1L, 10L, 10.0), (2L, 11L, 20.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = StatOps.jackknifeNationRevenue(orders, customer, nation)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(2) == 2000000000L)
    assert(out("B").getLong(2) == 1000000000L)
    assert(out("A").getDouble(3) == 500.0)
    // identical markets → replicates coincide → SE exactly 0
    val same = Seq((1L, 10L, 10.0), (2L, 11L, 10.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    assert(StatOps.jackknifeNationRevenue(same, customer, nation)
      .collect().forall(_.getDouble(3) == 0.0))
    // a single populated nation → no defined replicate → empty output
    val solo = Seq((1L, 10L, 10.0)).toDF("o_orderkey", "o_custkey",
      "o_totalprice")
    assert(StatOps.jackknifeNationRevenue(solo, customer, nation)
      .count() == 0)
  }

  test("welchWeekendRevenue: hand-checked t and df, degenerate guards") {
    // 2024-01-01..05 weekdays at $100/day; Sat 01-06 $100, Sun 01-07 $200
    // weekend: n=2, mean 15000c, a1=1e8 → v1=2.5e7; weekday a0=0, v0=0
    // t = 5000/√(2.5e7) = 1.0; df = v1²/(v1²/1) = 1.0
    val orders = Seq(
      (1L, ts("2024-01-01"), 100.0), (2L, ts("2024-01-02"), 100.0),
      (3L, ts("2024-01-03"), 100.0), (4L, ts("2024-01-06"), 100.0),
      (5L, ts("2024-01-07"), 200.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = StatOps.welchWeekendRevenue(orders).collect()(0)
    assert(r.getAs[Long]("n_weekend") == 2L)
    assert(r.getAs[Long]("n_weekday") == 3L)
    assert(r.getAs[Long]("mean_diff_microcents") == 5000000000L)
    assert(r.getAs[Double]("welch_t_r4") == 1.0)
    assert(r.getAs[Double]("welch_df_r2") == 1.0)
    // no weekend days at all → diff and t undefined, never a div error
    val wd = orders.filter(col("o_orderkey") <= 3)
    val r2 = StatOps.welchWeekendRevenue(wd).collect()(0)
    assert(r2.getAs[Long]("n_weekend") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("welch_t_r4")))
    // both groups constant → zero pooled variance → NULL t
    val const = Seq(
      (1L, ts("2024-01-01"), 100.0), (2L, ts("2024-01-02"), 100.0),
      (3L, ts("2024-01-06"), 100.0), (4L, ts("2024-01-07"), 100.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r3 = StatOps.welchWeekendRevenue(const).collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("welch_t_r4")))
  }

  test("kruskalWeekdayRevenue: exact H for separated groups, tie guard") {
    // Mondays {100,200}, Tuesdays {300,400}: doubled ranks 2,4 / 6,8
    // H = 3·(36/2 + 196/2)/(4·5) − 3·5 = 2.4 (the 2×2 max separation)
    val sep = Seq(
      (1L, ts("2024-01-01"), 100.0), (2L, ts("2024-01-08"), 200.0),
      (3L, ts("2024-01-02"), 300.0), (4L, ts("2024-01-09"), 400.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = StatOps.kruskalWeekdayRevenue(sep).collect()(0)
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("h_r6") == 2.4)
    assert(r.getAs[Double]("h_tie_corr_r6") == 2.4)
    // a single weekday group → H = 0 exactly
    val one = Seq(
      (1L, ts("2024-01-01"), 100.0), (2L, ts("2024-01-08"), 200.0),
      (3L, ts("2024-01-15"), 300.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    assert(StatOps.kruskalWeekdayRevenue(one).collect()(0)
      .getAs[Double]("h_r6") == 0.0)
    // every day ties → correction hits 0 → corrected H undefined
    val tied = Seq(
      (1L, ts("2024-01-01"), 100.0), (2L, ts("2024-01-02"), 100.0),
      (3L, ts("2024-01-03"), 100.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val rt = StatOps.kruskalWeekdayRevenue(tied).collect()(0)
    assert(rt.getAs[Double]("h_r6") == 0.0)
    assert(rt.isNullAt(rt.fieldIndex("h_tie_corr_r6")))
  }
}
