package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series operator Spark
  * lacks natively. Expressed as a composition (preference (a) in the
  * custom-operator ladder): tag both sides, union, and carry the right
  * side's value forward with an ignore-nulls last() window. One shuffle
  * on the key — no range join, no per-key loops — which is exactly the
  * plan you want at 100 TB (a sort-merge pass per key partition).
  */
object AsOfOps {

  /** For each left row, the most recent right `valueCol` with
    * right.ts <= left.ts within the same `keyCol` (ties: right-before-
    * left, then larger `ordCol` wins — fully deterministic).
    *
    * Inputs need columns (keyCol, tsCol, ordCol, valueCol); output is the
    * left rows + `asof_<valueCol>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, valueCol: String): DataFrame =
    withAsof(left, right, keyCol, tsCol, ordCol, valueCol)
      .drop("__asof_ts")

  /** [[asofJoin]] with a staleness bound — the "max age" form every
    * time-series store offers (Pandas merge_asof tolerance / kdb wj):
    * a match older than `tolerance` (tsCol units) is nulled, and the
    * match's age is reported. Same single-shuffle union+window shape;
    * the tolerance is a pure post-projection, never a second join or a
    * range join. Output adds `asof_<valueCol>` and `asof_age` (null when
    * no fresh-enough match).
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, ordCol: String, valueCol: String, tolerance: Long): DataFrame =
    withAsof(left, right, keyCol, tsCol, ordCol, valueCol)
      .withColumn("asof_age",
        when(col("__asof_ts").isNotNull &&
          col(tsCol) - col("__asof_ts") <= tolerance,
          col(tsCol) - col("__asof_ts")))
      .withColumn(s"asof_$valueCol",
        when(col("asof_age").isNotNull, col(s"asof_$valueCol")))
      .drop("__asof_ts")

  /** Shared union+window core: left rows with the most recent right
    * value AND its timestamp (`__asof_ts`) carried forward.
    */
  private def withAsof(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, ordCol: String, valueCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("__side"),
      col(ordCol), col(valueCol))
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("__side"),
      col(ordCol), col(valueCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(ordCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    r.union(l)
      .withColumn(s"asof_$valueCol",
        last(when(col("__side") === 0, col(valueCol)), ignoreNulls = true).over(w))
      .withColumn("__asof_ts",
        last(when(col("__side") === 0, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** For each purchase event, the value of the user's most recent
    * at-or-before signup event (the reference's "enrich fact with latest
    * dimension state" need, time-versioned).
    */
  def purchaseWithLastSignup(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("ts_s"), col("event_type"), col("value"))
    asofJoin(
      base.filter(col("event_type") === "purchase"),
      base.filter(col("event_type") === "signup"),
      "user_id", "ts_s", "event_id", "value")
      .select(col("event_id"), col("user_id"), col("ts_s"), col("value"),
        col("asof_value").as("last_signup_value"))
  }

  /** [[purchaseWithLastSignup]] with a freshness bound: the signup value
    * counts only when at most `toleranceS` seconds old at purchase time
    * (the "recent consent / recent session" enrichment rule). Adds the
    * match age in seconds; both null when no fresh-enough signup.
    */
  def purchaseWithRecentSignup(events: DataFrame, toleranceS: Long = 3600L): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("ts_s"), col("event_type"), col("value"))
    asofJoinWithin(
      base.filter(col("event_type") === "purchase"),
      base.filter(col("event_type") === "signup"),
      "user_id", "ts_s", "event_id", "value", toleranceS)
      .select(col("event_id"), col("user_id"), col("ts_s"), col("value"),
        col("asof_value").as("recent_signup_value"),
        col("asof_age").as("signup_age_s"))
  }

  /** Event-type transition counts (the first-order Markov matrix of user
    * behavior): per user, events ordered by (time, event_id), each
    * adjacent pair counted as a from→to transition. The session-path
    * statistic behind funnel mining and next-event models. Scale shape:
    * the lead() window partitions by user (bounded per-user history, no
    * global sort) and the transition rollup is map-side combined to at
    * most |event_types|² rows.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    events
      // null ts/user rows can't join an adjacency chain (and the two
      // engines order NULLs differently in windows — keep the input total)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** [[asofJoin]] through the custom physical operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]): per
    * left row, the right row with the greatest (tsCol, ordCol) at-or-
    * before the left row's tsCol on the same key (optionally within
    * `tolerance` tsCol units). Output = left columns + `asof_ts` (the
    * matched right timestamp) + `asof_<c>` for each of `rightCols` —
    * whole-ROW semantics: the matched row's values ride along even when
    * null (the union-window form's ignore-nulls value carry would skip
    * them).
    *
    * Scale: EnsureRequirements plans exactly one hash exchange per side
    * on the key plus one per-partition sort each; the merge pass holds
    * ONE candidate row — no window frame, so key skew costs time, never
    * memory. tsCol/ordCol must cast to long.
    */
  def asofJoinPhysical(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, ordCol: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    val spark = left.sparkSession
    GraftPlanBridge.ensureStrategy(spark, graft.plans.AsOfJoinStrategy)
    val l = left.withColumn("__l_ts", col(tsCol).cast("long"))
    // fresh aliases give the right side fresh exprIds, so a self-join
    // (both sides derived from one scan) has unambiguous node output
    val r = right.select(
      col(keyCol).as("__r_key") +:
        col(tsCol).cast("long").as("__r_ts") +:
        col(ordCol).cast("long").as("__r_ord") +:
        rightCols.map(c => col(c).as(s"__rv_$c")): _*)
    val lp = GraftPlanBridge.analyzed(l)
    val rp = GraftPlanBridge.analyzed(r)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val node = graft.plans.AsOfJoinPlan(lp, rp,
      Seq(attr(lp, keyCol)), Seq(attr(rp, "__r_key")),
      attr(lp, "__l_ts"), attr(rp, "__r_ts"), attr(rp, "__r_ord"), tolerance)
    GraftPlanBridge.ofRows(spark, node)
      .select(left.columns.map(col) ++
        (col("__r_ts").as("asof_ts") +:
          rightCols.map(c => col(s"__rv_$c").as(s"asof_$c"))): _*)
  }

  /** [[purchaseWithLastSignup]] re-planned through the physical as-of
    * operator, with whole-row match output: each purchase carries its
    * most recent at-or-before signup's event_id, timestamp, and value.
    */
  def purchaseLastSignupPhysical(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("ts_s"), col("event_type"), col("value"))
    asofJoinPhysical(
      base.filter(col("event_type") === "purchase"),
      base.filter(col("event_type") === "signup"),
      "user_id", "ts_s", "event_id", Seq("event_id", "value"))
      .select(col("event_id"), col("user_id"), col("ts_s"), col("value"),
        col("asof_event_id").as("signup_event"),
        col("asof_ts").as("signup_ts"),
        col("asof_value").as("signup_value"))
  }

  /** Last-touch purchase attribution — each purchase credits the most
    * recent click/view by the same user within `toleranceS` seconds;
    * older or absent touches fall back to 'organic'. The attribution
    * rollup every marketing dashboard runs, composed directly from the
    * [[asofJoinWithin]] single-shuffle union+window core (no range join,
    * no per-user collect).
    *
    * Scale: one shuffle by user for the as-of pass; the value join-back
    * is keyed by event_id over purchase-count rows only; the rollup is
    * map-side combined to ≤ |touch types|+1 rows. Exact decimal revenue
    * projected as a rounded double; share in integer micro-units.
    */
  def purchaseAttribution(events: DataFrame, toleranceS: Long = 259200): DataFrame = {
    val e = events
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("long").as("ts_s"))
    val touches = e.filter(col("event_type").isin("click", "view"))
    val purchases = e.filter(col("event_type") === "purchase")
    val attributed = asofJoinWithin(
      purchases.select(col("user_id"), col("ts_s"), col("event_id"),
        col("event_type")),
      touches.select(col("user_id"), col("ts_s"), col("event_id"),
        col("event_type")),
      "user_id", "ts_s", "event_id", "event_type", toleranceS)
      .select(col("event_id"),
        coalesce(col("asof_event_type"), lit("organic")).as("touch_type"))
    attributed
      .join(purchases.select(col("event_id"), col("value")), Seq("event_id"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("revenue"))
      .withColumn("purchase_share_micro",
        expr("(n_purchases * 1000000) div (sum(n_purchases) over ())"))
  }

  /** Ordered-step conversion funnel within a time window (the
    * ClickHouse `windowFunnel` shape): per user, the deepest chain
    * view ≤ click ≤ purchase whose whole span fits in `windowS` seconds
    * of the anchoring view, then a level histogram. Existence of a
    * level-3 chain is decided WITHOUT enumerating chains: with
    * lv(t) = latest view at-or-before t and clv(t) = max over clicks
    * c ≤ t of lv(c), a purchase p completes a chain iff clv(p) ≥ p−W
    * (a click before p that had a view within [p−W, c] — the greedy
    * latest-view choice is optimal because a later view only leaves
    * more window). Both are running maxima over ONE per-user
    * time-ordered window (RANGE frame so equal timestamps are handled
    * set-wise, not by nondeterministic peer order).
    *
    * Scale: one shuffle by user_id; two Window operators share the
    * same sort; the histogram is a ≤4-row aggregate. No self-joins —
    * the naive exists-chain formulation is two fact-fact inequality
    * joins that explode on active users.
    */
  def windowFunnel(events: DataFrame, windowS: Long = 21600): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts").cast("long").as("ts_s"), col("event_type"))
    val staged = e
      .withColumn("lv", max(when(col("event_type") === "view", col("ts_s"))).over(w))
      .withColumn("clv", max(when(col("event_type") === "click", col("lv"))).over(w))
    val perUser = staged.groupBy(col("user_id")).agg(
      max(when(col("event_type") === "view", 1).otherwise(0)).as("l1"),
      max(when(col("event_type") === "click" &&
        col("lv") >= col("ts_s") - windowS, 1).otherwise(0)).as("l2"),
      max(when(col("event_type") === "purchase" &&
        col("clv") >= col("ts_s") - windowS, 1).otherwise(0)).as("l3"))
    perUser
      .select(when(col("l3") === 1, 3L).when(col("l2") === 1, 2L)
        .when(col("l1") === 1, 1L).otherwise(0L).as("funnel_level"))
      .groupBy(col("funnel_level"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("user_share_micro",
        expr("(n_users * 1000000) div (sum(n_users) over ())"))
  }

  /** Per-event funnel level-progress emissions — the oracle-checkable
    * batch mirror of [[graft.streaming.EventStreams.funnelStream]]: one
    * row (user_id, ts_s, funnel_level) for every event at which the
    * user's deepest reached level increases, exactly the rows the live
    * dashboard feed emits. Shares [[windowFunnel]]'s running-maxima
    * staging (lv/clv over RANGE frames, so equal timestamps resolve
    * set-wise); the emission layer adds a per-event achieved level and
    * a running best over (ts, view<click<purchase) ROWS order — the
    * same sequencing the stream applies inside a micro-batch, which is
    * what makes stream output ≡ batch output row-for-row (spec'd).
    * Within an equal-(ts, rank) tie group every member computes the
    * same running values, so exactly one emission survives regardless
    * of physical peer order in either engine.
    *
    * Scale: one shuffle by user_id shared by all four windows; no
    * joins, no per-user history retained — the stream needs two longs
    * of state, the batch mirror needs two sorted window passes.
    */
  def funnelProgress(events: DataFrame, windowS: Long = 21600): DataFrame = {
    val wr = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events
      .filter(col("event_type").isin("view", "click", "purchase") &&
        col("ts").isNotNull)
      .select(col("user_id"), col("ts").cast("long").as("ts_s"),
        col("event_type"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1).otherwise(2).as("rk"))
    val staged = e
      .withColumn("lv",
        max(when(col("event_type") === "view", col("ts_s"))).over(wr))
      .withColumn("clv",
        max(when(col("event_type") === "click", col("lv"))).over(wr))
      .withColumn("ach",
        when(col("event_type") === "view", 1L)
          .when(col("event_type") === "click" &&
            col("lv") >= col("ts_s") - windowS, 2L)
          .when(col("event_type") === "purchase" &&
            col("clv") >= col("ts_s") - windowS, 3L)
          .otherwise(0L))
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("rk"))
    staged
      .withColumn("best", max(col("ach")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_best", coalesce(max(col("ach")).over(
        wo.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("best") > col("prev_best"))
      .select(col("user_id"), col("ts_s"), col("best").as("funnel_level"))
  }

  /** Multi-touch LINEAR attribution — the equal-split complement of
    * [[purchaseAttribution]]'s last-touch model: each purchase's value
    * divides equally over every view/click touch in its trailing
    * `windowS` window, in EXACT cents via largest-remainder (Hamilton)
    * apportionment per purchase (credit_view + credit_click = value
    * exactly; the ≤1 leftover cent goes to the larger remainder, ties
    * to view). Purchases with no in-window touch credit 'organic'.
    *
    * Zero joins: per-touch-type in-window counts are RANGE-frame window
    * counts over ONE user-partitioned pass (the naive formulation is a
    * purchases×touches interval join), so the plan is a single shuffle
    * by user_id; the rollup is a ≤3-row aggregate.
    */
  def linearAttribution(events: DataFrame, windowS: Long = 21600): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-windowS, Window.currentRow)
    val counted = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts").cast("long").as("ts_s"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("nv",
        count(when(col("event_type") === "view", 1)).over(w))
      .withColumn("nc",
        count(when(col("event_type") === "click", 1)).over(w))
    val p = counted.filter(col("event_type") === "purchase")
      .withColumn("n", col("nv") + col("nc"))
      .withColumn("cv0", when(col("n") === 0, 0L)
        .otherwise(expr("(cents * nv) div n")))
      .withColumn("cc0", when(col("n") === 0, 0L)
        .otherwise(expr("(cents * nc) div n")))
      .withColumn("rv", when(col("n") === 0, 0L)
        .otherwise(expr("(cents * nv) % n")))
      .withColumn("rc", when(col("n") === 0, 0L)
        .otherwise(expr("(cents * nc) % n")))
      // the n = 0 leftover is the WHOLE value and belongs to organic,
      // not to the tied-remainder view bucket
      .withColumn("leftover", col("cents") - col("cv0") - col("cc0"))
      .withColumn("cv", col("cv0") +
        when(col("n") > 0 && col("rv") >= col("rc"), col("leftover")).otherwise(0L))
      .withColumn("cc", col("cc0") +
        when(col("n") > 0 && col("rv") < col("rc"), col("leftover")).otherwise(0L))
    p.select(explode(array(
        struct(lit("view").as("touch_type"), col("cv").as("credit_cents")),
        struct(lit("click").as("touch_type"), col("cc").as("credit_cents")),
        struct(lit("organic").as("touch_type"),
          when(col("n") === 0, col("cents")).otherwise(0L).as("credit_cents"))))
        .as("t"))
      .select(col("t.touch_type"), col("t.credit_cents"))
      .groupBy(col("touch_type"))
      .agg(count(when(col("credit_cents") > 0, 1)).as("n_credited_purchases"),
        round(sum(col("credit_cents")) / 100.0, 2).as("credit"))
  }

  /** POSITION-BASED (U-shaped 40/20/40) attribution over the same
    * purchase-window touches as [[linearAttribution]] — the standard
    * alternative weighting: the introducing touch and the closing touch
    * each take 40% of the purchase value, the middle touches split the
    * remaining 20%. Degenerate windows follow the convention: a single
    * touch takes 100%, two touches split 50/50, no touches → organic.
    *
    * Exactness: integer-cent arithmetic throughout — 40% = (cents·2)
    * div 5, the middle pool divides by (n−2) with the REMAINDER
    * assigned to the first touch's type (a deterministic rule both
    * engines replay; value conservation is exact by construction).
    * First/last touches are identified by the min/max of a fixed-width
    * sortable string key (zero-padded seconds ‖ event id ‖ type), so
    * same-second ties break on event id identically in both engines.
    *
    * Scale: same as linear — per-user range windows over the event
    * stream (one shuffle on user_id), then a 3-row rollup.
    */
  def positionAttribution(events: DataFrame, windowS: Long = 21600): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-windowS, Window.currentRow)
    // event_id pads to 20 — the full non-negative int64 digit range —
    // because lpad TRUNCATES longer inputs in both engines, which would
    // corrupt first/last ordering and collide keys past 16 digits
    val key = concat(lpad(col("ts_s").cast("string"), 16, "0"),
      lpad(col("event_id").cast("string"), 20, "0"), col("event_type"))
    val isTouch = col("event_type").isin("view", "click")
    val counted = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("nv",
        count(when(col("event_type") === "view", 1)).over(w))
      .withColumn("nc",
        count(when(col("event_type") === "click", 1)).over(w))
      .withColumn("fk", min(when(isTouch, key)).over(w))
      .withColumn("lk", max(when(isTouch, key)).over(w))
    val p = counted.filter(col("event_type") === "purchase")
      .withColumn("n", col("nv") + col("nc"))
      .withColumn("ft", substring(col("fk"), 37, 16))
      .withColumn("lt", substring(col("lk"), 37, 16))
      .withColumn("f40", expr("(cents * 2) div 5"))
      .withColumn("l40", expr("(cents * 2) div 5"))
      .withColumn("pool", col("cents") - col("f40") - col("l40"))
      .withColumn("base", when(col("n") >= 3, expr("pool div (n - 2)")))
      .withColumn("rem", when(col("n") >= 3, expr("pool % (n - 2)")))
    def creditOf(t: String, nMid: Column): Column =
      when(col("n") === 0, 0L)
        .when(col("n") === 1,
          when(col("ft") === t, col("cents")).otherwise(0L))
        .when(col("n") === 2,
          when(col("ft") === t, expr("cents div 2 + cents % 2")).otherwise(0L) +
            when(col("lt") === t, expr("cents div 2")).otherwise(0L))
        .otherwise(
          when(col("ft") === t, col("f40") + col("rem")).otherwise(0L) +
            when(col("lt") === t, col("l40")).otherwise(0L) +
            nMid * col("base"))
    val credited = p
      .withColumn("nmv", col("nv") -
        when(col("ft") === "view", 1L).otherwise(0L) -
        when(col("lt") === "view", 1L).otherwise(0L))
      .withColumn("nmc", col("nc") -
        when(col("ft") === "click", 1L).otherwise(0L) -
        when(col("lt") === "click", 1L).otherwise(0L))
      .withColumn("cv", creditOf("view", col("nmv")))
      .withColumn("cc", creditOf("click", col("nmc")))
    credited.select(explode(array(
        struct(lit("view").as("touch_type"), col("cv").as("credit_cents")),
        struct(lit("click").as("touch_type"), col("cc").as("credit_cents")),
        struct(lit("organic").as("touch_type"),
          when(col("n") === 0, col("cents")).otherwise(0L).as("credit_cents"))))
        .as("t"))
      .select(col("t.touch_type"), col("t.credit_cents"))
      .groupBy(col("touch_type"))
      .agg(count(when(col("credit_cents") > 0, 1)).as("n_credited_purchases"),
        round(sum(col("credit_cents")) / 100.0, 2).as("credit"))
  }

  /** Signup→purchase funnel per user: stage 0 = never signed up, 1 =
    * signed up only, 2 = purchased at-or-after first signup. One grouped
    * pass, then a tiny stage histogram.
    */
  def signupPurchaseFunnel(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"), col("ts").cast("long").as("ts_s"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts_s"))).as("first_signup"),
        max(when(col("event_type") === "purchase", col("ts_s"))).as("last_purchase"))
    perUser
      .select(
        when(col("first_signup").isNull, 0)
          .when(col("last_purchase").isNotNull &&
            col("last_purchase") >= col("first_signup"), 2)
          .otherwise(1).as("funnel_stage"))
      .groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Batch interval join, time-banded — for every error event, the
    * count and cents-value of the SAME user's clicks in the preceding
    * `windowS`-second window (the "what led up to this failure" context
    * query; the batch twin of the streaming interval join). The range
    * predicate is r.ts ∈ [err.ts − windowS, err.ts).
    *
    * Scale: the classic banded-range-join rewrite — each side buckets
    * time by the window length; an error's window spans at most two
    * buckets, so the left side explodes ×2 and the join is pure EQUI on
    * (user_id, bucket) with the range check as a post-filter. No
    * per-user window sort, no cross product; skew is bounded by
    * per-user-per-window activity, and the equi keys co-partition both
    * sides at any SF.
    */
  def errorClickContext(events: DataFrame, windowS: Long = 600L): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("ts_s"), col("event_type"), col("value"))
    val errors = base.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_s"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), expr(s"ts_s div $windowS").as("bucket"),
        col("ts_s").as("c_ts"),
        expr("cast(round(value * 100) as bigint)").as("c_cents"))
    val probes = errors.select(col("user_id"), col("event_id"), col("ts_s"),
      explode(array(expr(s"ts_s div $windowS"),
        expr(s"ts_s div $windowS - 1"))).as("bucket"))
    val matched = probes.join(clicks, Seq("user_id", "bucket"))
      .filter(col("c_ts") >= col("ts_s") - windowS && col("c_ts") < col("ts_s"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"), sum(col("c_cents")).as("clicks_cents"))
    errors.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_s"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("clicks_cents"), lit(0L)).as("clicks_cents"))
  }

  /** Conversion-latency distribution: for every purchase with an
    * at-or-before signup (the [[withAsof]] union-window core), the
    * signup→purchase latency in whole seconds, summarized as EXACT
    * quartile order statistics (percentile_disc semantics: smallest v
    * with 4·cum ≥ k·n — pure integer comparisons, no interpolation
    * division) plus the max. Funnel operators count conversions; this
    * is the "how long does converting take" product metric next to
    * them.
    *
    * Scale: one user-partitioned as-of pass (no global sort), then a
    * rollup to the DISTINCT-latency grid — bounded by the clock span of
    * the feed (seconds in the retention window), not by event volume.
    * The cumulative over that grid factors through TWO bounded window
    * levels (the theil_sen_cdf / skyline pattern): latencies range-bucket
    * into ≤1025 value buckets, the cross-bucket prefix rides a window
    * over BUCKET SUMMARIES only, and the within-bucket cumulative
    * partitions by bucket — a year-long feed at 1-second grain is ~3×10⁷
    * grid rows, and an unpartitioned window there would be one straggler
    * task at 100× even though the grid is data-size-independent.
    */
  def conversionLatencyQuartiles(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("ts_s"), col("event_type"), col("value"))
    val lat = withAsof(
      base.filter(col("event_type") === "purchase"),
      base.filter(col("event_type") === "signup"),
      "user_id", "ts_s", "event_id", "value")
      .filter(col("__asof_ts").isNotNull)
      .select((col("ts_s") - col("__asof_ts")).as("lat_s"))
    val byV = lat.groupBy(col("lat_s")).agg(count(lit(1)).as("m"))
    val cdf = OpUtils.twoLevelCum(byV, "lat_s", "m")
      .select(col("lat_s"), col("cum"))
    val tot = byV.agg(sum(col("m")).as("n"))
    cdf
      .crossJoin(broadcast(tot))
      .groupBy(col("n").as("n_conversions"))
      .agg(
        min(when(col("cum") * 4 >= col("n"), col("lat_s"))).as("p25_s"),
        min(when(col("cum") * 4 >= col("n") * 2, col("lat_s"))).as("p50_s"),
        min(when(col("cum") * 4 >= col("n") * 3, col("lat_s"))).as("p75_s"),
        max(col("lat_s")).as("max_s"))
  }
}
