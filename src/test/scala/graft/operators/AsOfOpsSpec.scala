package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: Long, user: Long, typ: String, v: Double) =
    (id, new Timestamp(t * 1000L), user, typ, v, "{}")

  private val events = Seq(
    ev(1, 100, 1, "signup", 10.0),
    ev(2, 200, 1, "purchase", 99.0),  // after signup 10.0
    ev(3, 300, 1, "signup", 20.0),
    ev(4, 400, 1, "purchase", 77.0),  // after signup 20.0
    ev(5, 150, 2, "purchase", 55.0),  // user 2 never signed up
    ev(6, 500, 3, "signup", 30.0))    // user 3 signed up, never purchased
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("linear attribution splits exact cents with largest-remainder leftovers") {
    val evs = Seq(
      // u1: one view + one click before a 1.00 purchase → 50/50
      ev(1, 0, 1, "view", 0.0), ev(2, 100, 1, "click", 0.0),
      ev(3, 200, 1, "purchase", 1.0),
      // u2: one view + two clicks before a 1.00 purchase → 33/67 (the
      // leftover cent goes to click: remainder 2 > 1)
      ev(4, 50, 2, "view", 0.0), ev(5, 60, 2, "click", 0.0),
      ev(6, 70, 2, "click", 0.0), ev(7, 100, 2, "purchase", 1.0),
      // u3: no touches → organic
      ev(8, 100, 3, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsOfOps.linearAttribution(evs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(
      "view" -> ((2L, 0.83)), "click" -> ((2L, 1.17)),
      "organic" -> ((1L, 5.0))))
    // conservation: credits sum exactly to the purchase value total
    assert(out.values.map(_._2).sum == 7.0)
  }

  test("position attribution: U-shaped 40/20/40 with degenerate window sizes") {
    val evs = Seq(
      // u1: view-click-view before a 10.00 purchase → first/last views
      // take 400c each, the middle click takes the 200c pool
      ev(1, 1000, 1, "view", 0.0), ev(2, 2000, 1, "click", 0.0),
      ev(3, 3000, 1, "view", 0.0), ev(4, 4000, 1, "purchase", 10.0),
      // u2: two touches split 50/50 (first gets any odd cent)
      ev(5, 1000, 2, "view", 0.0), ev(6, 2000, 2, "click", 0.0),
      ev(7, 3000, 2, "purchase", 10.0),
      // u3: single touch takes 100%
      ev(8, 1000, 3, "click", 0.0), ev(9, 2000, 3, "purchase", 8.0),
      // u4: no touches → organic
      ev(10, 1000, 4, "purchase", 5.0),
      // u5: same-second touches break the tie on event id → view is
      // first, click is last → 50/50
      ev(11, 1000, 5, "view", 0.0), ev(12, 1000, 5, "click", 0.0),
      ev(13, 1200, 5, "purchase", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsOfOps.positionAttribution(evs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(
      "view" -> ((3L, 18.0)), "click" -> ((4L, 20.0)),
      "organic" -> ((1L, 5.0))))
    // conservation: every purchase's value is fully credited
    assert(out.values.map(_._2).sum == 43.0)
  }

  test("window funnel: ordered chain within the window, greedy anchor, boundaries") {
    def fe(id: Long, user: Long, t: Long, typ: String) = ev(id, t, user, typ, 0.0)
    val funnelEvents = Seq(
      // u1: clean 3-step chain, span 200s → level 3
      fe(1, 1, 0, "view"), fe(2, 1, 100, "click"), fe(3, 1, 200, "purchase"),
      // u2: click/purchase BEFORE the only view → order violated → level 1
      fe(4, 2, 0, "click"), fe(5, 2, 100, "purchase"), fe(6, 2, 200, "view"),
      // u3: click 5000s after the view (> 3600) → level 1
      fe(7, 3, 0, "view"), fe(8, 3, 5000, "click"),
      // u4: view+click ok, purchase outside the view's window → level 2
      fe(9, 4, 0, "view"), fe(10, 4, 100, "click"), fe(11, 4, 4000, "purchase"),
      // u5: purchase only → level 0
      fe(12, 5, 100, "purchase"),
      // u6: click exactly AT the window boundary (3600 ≤ W) → level 2
      fe(13, 6, 0, "view"), fe(14, 6, 3600, "click"),
      // u7: whole chain at one timestamp (RANGE frame peers) → level 3
      fe(15, 7, 50, "view"), fe(16, 7, 50, "click"), fe(17, 7, 50, "purchase"),
      // u8: stale first (view, click), fresh second pair makes the
      // purchase reachable — the greedy latest-view anchor must win
      fe(18, 8, 0, "view"), fe(19, 8, 100, "click"),
      fe(20, 8, 3000, "view"), fe(21, 8, 3100, "click"),
      fe(22, 8, 6500, "purchase"),
      // noise: non-funnel event types are ignored
      fe(23, 1, 150, "error"), fe(24, 5, 50, "signup"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsOfOps.windowFunnel(funnelEvents, windowS = 3600)
      .orderBy("funnel_level")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // levels: u5→0; u2,u3→1; u4,u6→2; u1,u7,u8→3 (8 users)
    assert(out == Seq(
      (0L, 1L, 125000L), (1L, 2L, 250000L),
      (2L, 2L, 250000L), (3L, 3L, 375000L)))
  }

  test("asof join picks the most recent at-or-before signup per purchase") {
    val out = AsOfOps.purchaseWithLastSignup(events)
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getDouble(4))).toSeq ==
      Seq((2L, 10.0), (4L, 20.0), (5L, null)))
  }

  test("asof tolerance nulls stale matches and reports the age") {
    // purchase at 200 is 100s after signup; purchase at 400 is 100s after
    // the second signup; with tolerance 50s both are stale
    val out = AsOfOps.purchaseWithRecentSignup(events, toleranceS = 150L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getLong(5))).toSeq
    assert(out == Seq((2L, 10.0, 100L), (4L, 20.0, 100L), (5L, null, null)))
    val stale = AsOfOps.purchaseWithRecentSignup(events, toleranceS = 50L)
      .collect()
    assert(stale.forall(_.isNullAt(4)) && stale.forall(_.isNullAt(5)))
  }

  test("eventTransitions counts adjacent per-user event pairs") {
    // user 1: signup→purchase→signup→purchase; users 2 & 3: single events
    val out = AsOfOps.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("signup", "purchase") -> 2L,
      ("purchase", "signup") -> 1L))
  }

  test("funnel stages count users correctly") {
    val out = AsOfOps.signupPurchaseFunnel(events)
      .orderBy("funnel_stage").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out == Seq((0, 1L), (1, 1L), (2, 1L)))
  }

  test("purchaseAttribution credits the last fresh touch, else organic") {
    val evs = Seq(
      ev(1, 100, 1, "click", 0.0),
      ev(2, 150, 1, "view", 0.0),
      ev(3, 200, 1, "purchase", 50.0),   // last touch = view@150
      ev(4, 1000, 2, "click", 0.0),
      ev(5, 5000, 2, "purchase", 30.0),  // click stale at tolerance 1000
      ev(6, 300, 3, "purchase", 20.0))   // no touch at all
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsOfOps.purchaseAttribution(evs, toleranceS = 1000)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out == Map(
      "view" -> ((1L, 50.0, 333333L)),
      "organic" -> ((2L, 50.0, 666666L))))
  }

  test("errorClickContext honors the [ts-600, ts) same-user window") {
    val evs = Seq(
      ev(1, 350, 1, "click", 1.00),   // 350 < 1000-600 → outside
      ev(2, 400, 1, "click", 1.25),   // boundary: ts-600 inclusive
      ev(3, 999, 1, "click", 2.50),   // inside
      ev(4, 1000, 1, "click", 9.99),  // error instant itself → excluded
      ev(5, 990, 2, "click", 5.00),   // other user
      ev(6, 1000, 1, "error", 0.0),
      ev(7, 500, 3, "error", 0.0))    // no clicks at all
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsOfOps.errorClickContext(evs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(6L -> ((2L, 375L)), 7L -> ((0L, 0L))))
  }

  test("conversionLatencyQuartiles: exact percentile_disc order statistics") {
    // latencies: u1 purchases at 200 (signup 100 → 100 s) and 400
    // (signup 300 → 100 s); plus three more users with 20, 40, 1000 s;
    // one unconverted purchase (user 9, no signup) must not count.
    // sorted latencies {20, 40, 100, 100, 1000}: p25 = 40 (4·cum ≥ n at
    // cum 2... 4·1=4 < 5 → 20 out; 4·2=8 ≥ 5 → 40), p50 = 100, p75 = 100
    val evs = Seq(
      ev(1, 100, 1, "signup", 0.0), ev(2, 200, 1, "purchase", 1.0),
      ev(3, 300, 1, "signup", 0.0), ev(4, 400, 1, "purchase", 1.0),
      ev(5, 0, 2, "signup", 0.0), ev(6, 20, 2, "purchase", 1.0),
      ev(7, 0, 3, "signup", 0.0), ev(8, 40, 3, "purchase", 1.0),
      ev(9, 0, 4, "signup", 0.0), ev(10, 1000, 4, "purchase", 1.0),
      ev(11, 50, 9, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = AsOfOps.conversionLatencyQuartiles(evs).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4)) == ((5L, 40L, 100L, 100L, 1000L)))
  }
}
