package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class SurvivalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // t0 = 2024-01-01 00:00; study cutoff = t0 + 14 days (h = 336).
  //  u1 signup t0,       purchase t0+2h            → event at h=2
  //  u2 signup t0+1h,    purchase t0+3h            → event at h=2
  //  u3 signup t0,       never purchases           → censored at h=336
  //  u4 signup t0,       purchase t0+15d (> cutoff) → censored at h=336
  //  u5 signup t0+335h,  never purchases           → censored at h=1
  //  u6 signup t0+2h,    purchase t0+1h (BEFORE signup) → censored at h=334
  // grid: h=1 (w1,d0), h=2 (w2,d2), h=334 (w1,d0), h=336 (w2,d0); N=6.
  // At the only event hour: n_risk = 6 − 1 (the h=1 censoring) = 5.
  private def events = Seq(
    (1L, ts("2024-01-01 00:00:00"), "signup"),
    (1L, ts("2024-01-01 02:00:00"), "purchase"),
    (2L, ts("2024-01-01 01:00:00"), "signup"),
    (2L, ts("2024-01-01 03:00:00"), "purchase"),
    (3L, ts("2024-01-01 00:00:00"), "signup"),
    (4L, ts("2024-01-01 00:00:00"), "signup"),
    (4L, ts("2024-01-16 00:00:00"), "purchase"),
    (5L, ts("2024-01-14 23:00:00"), "signup"),
    (6L, ts("2024-01-01 02:00:00"), "signup"),
    (6L, ts("2024-01-01 01:00:00"), "purchase"))
    .toDF("user_id", "ts", "event_type")

  test("nelsonAalenConversion: censoring shapes the risk set, hazard exact") {
    val out = SurvivalOps.nelsonAalenConversion(events).collect()
    assert(out.length == 1) // rows at event hours only
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 5L, 2L, 0L)))
    assert(r.getLong(4) == 400000000L) // ⌊2·10⁹/5⌋
    assert(r.getLong(5) == 400000000L)
  }

  test("kaplanMeierConversion: integer survival recurrence from 10^12") {
    val out = SurvivalOps.kaplanMeierConversion(events).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 5L, 2L, 0L)))
    assert(r.getLong(4) == 600000000000L) // 10¹²·(5−2)/5
  }

  test("two event hours compound the survival product in order") {
    // 3 users sign up at t0; purchases at h=1, h=2; one never converts
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "purchase"),
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-01 02:30:00"), "purchase"),
      (3L, ts("2024-01-01 00:00:00"), "signup"))
      .toDF("user_id", "ts", "event_type")
    val km = SurvivalOps.kaplanMeierConversion(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    // h=1: S = 10¹²·2/3 = 666666666666; h=2: S = that·1/2 = 333333333333
    assert(km == Map(1L -> 666666666666L, 2L -> 333333333333L))
    val na = SurvivalOps.nelsonAalenConversion(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    // h=1: ⌊10⁹/3⌋; h=2: + ⌊10⁹/2⌋
    assert(na == Map(1L -> ((3L, 333333333L)), 2L -> ((2L, 833333333L))))
  }

  test("logrankConversionAb matches an independent fold of the arm grid") {
    // real testdata (1094 users' worth of events at sf0.001): the
    // window-based prefix/at-risk/term pipeline must agree with a
    // straight BigInt fold over the collected arm grid — an independent
    // execution path for the same integer definitions
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = SurvivalOps.logrankConversionAb(ev).collect()(0)
    val grid = SurvivalOps.conversionArmGrid(ev, 14)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1) // (h, arm, d, w)
    val nt1 = grid.filter(_._2 == 1).map(_._4).sum
    val nt0 = grid.filter(_._2 == 0).map(_._4).sum
    var (cp1, cp0) = (0L, 0L)
    var (o1, o0) = (0L, 0L)
    var (e1, v) = (BigInt(0), BigInt(0))
    grid.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      val d1 = rows.filter(_._2 == 1).map(_._3).sum
      val d0 = rows.filter(_._2 == 0).map(_._3).sum
      val w1 = rows.filter(_._2 == 1).map(_._4).sum
      val w0 = rows.filter(_._2 == 0).map(_._4).sum
      val (n1, n0) = (nt1 - cp1, nt0 - cp0)
      val (dt, n) = (d1 + d0, n1 + n0)
      if (dt > 0) {
        o1 += d1; o0 += d0
        e1 += BigInt(dt) * n1 * 1000000 / n
        val fa = BigInt(n1) * 1000000 / n
        val fb = BigInt(n0) * 1000000 / n
        val fc = if (n > 1) BigInt(n - dt) * 1000000 / (n - 1) else BigInt(0)
        v += (BigInt(dt) * fa * fb / 1000000) * fc / 1000000
      }
      cp1 += w1; cp0 += w0
    }
    assert(out.getAs[Long]("n_users_a") == nt0)
    assert(out.getAs[Long]("n_users_b") == nt1)
    assert(out.getAs[Long]("conv_a") == o0)
    assert(out.getAs[Long]("conv_b") == o1)
    assert(out.getAs[Long]("expected_b_micro") == e1.toLong)
    assert(out.getAs[Long]("variance_micro") == v.toLong)
    val z = out.getAs[Double]("logrank_z_r4")
    // a null 50/50 hash split on identical behavior: |Z| comfortably
    // inside ±3 (calibration, not significance)
    assert(math.abs(z) < 3.0)
  }

  test("degenerate inputs yield empty outputs, not errors") {
    val empty = Seq.empty[(Long, Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    assert(SurvivalOps.nelsonAalenConversion(empty).count() == 0)
    assert(SurvivalOps.kaplanMeierConversion(empty).count() == 0)
    assert(SurvivalOps.logrankConversionAb(empty).count() == 0)
    // purchases without any signup: no one is at risk, nothing to report
    val pOnly = Seq((1L, ts("2024-01-01 00:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    assert(SurvivalOps.kaplanMeierConversion(pOnly).count() == 0)
  }
}
