package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series trend operators over the order history: closed-form OLS
  * regression and calendar gap-filling — the statistical layer the
  * reference runs notebook-side (SageMaker trend analyses over the
  * warehouse) re-expressed as exact distributed aggregations.
  */
object TrendOps {

  /** Per-region OLS trend of monthly revenue: slope/intercept from the
    * closed form on EXACT integer sums (n, Σt, Σt², Σy, Σty in cents),
    * so partitioning/merge order can never change the result; the only
    * floating-point step is the final division, identical IEEE ops in
    * both engines.
    *
    * Scale: one fact-sized grouped agg to (region, month) — map-side
    * combined, ≤ regions×months rows out — then a region-sized second
    * agg. The closed-form products are computed in DECIMAL(38,0): cents
    * sums at 100 TB reach ~10¹⁴-10¹⁵ and n·Σty-style products cross 2⁶³,
    * so BIGINT products would overflow where decimal(38) does not.
    */
  def olsRevenueTrend(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val monthly = orders
      .select(col("o_custkey"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("t"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("t"))
      .agg((sum(col("p")) * 100).cast("long").as("y_cents"))
    monthly
      .groupBy(col("region"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("t")).cast("decimal(38,0)").as("st"),
        sum(col("t") * col("t")).cast("decimal(38,0)").as("stt"),
        sum(col("y_cents")).cast("decimal(38,0)").as("sy"),
        sum(col("t") * col("y_cents")).cast("decimal(38,0)").as("sty"))
      .select(col("region"), col("n").cast("long").as("n_months"),
        round((col("n") * col("sty") - col("st") * col("sy")).cast("double") /
          (col("n") * col("stt") - col("st") * col("st")).cast("double"), 4)
          .as("slope_cents_per_month"),
        round((col("sy") * col("stt") - col("st") * col("sty")).cast("double") /
          (col("n") * col("stt") - col("st") * col("st")).cast("double"), 2)
          .as("intercept_cents"),
        round(col("sy").cast("double") / col("n").cast("double"), 2)
          .as("mean_monthly_cents"))
  }

  /** Autocorrelation function of daily revenue at lags 1..maxLag — the
    * seasonality/persistence diagnostic run before fitting any
    * forecasting model. Pearson r over the (y_d, y_{d+k}) pairs that
    * both exist, from EXACT integer sums (n, Σx, Σy, Σx², Σy², Σxy in
    * cents, DECIMAL(38,0) — cents² products cross 2⁶³ long before 100
    * TB): merge order and partitioning can never change the result.
    * The final r = cov/√(varx·vary) is computed in double from those
    * exact integers — IEEE division and sqrt are correctly rounded, so
    * both engines produce the identical bit pattern.
    *
    * Scale: ONE fact-sized map-side-combined rollup to the day grain;
    * everything after (the ×maxLag explode, the self-join on the
    * shifted date, the per-lag agg) runs on the CALENDAR-bounded daily
    * table, never the fact.
    */
  def acfDailyRevenue(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = OpUtils.dailyFact(orders).select(col("d"), col("y"))
    val shifted = daily
      .select(col("d"), col("y"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("d2", date_add(col("d"), col("lag")))
    shifted
      .join(daily.select(col("d").as("d2"), col("y").as("y2")), Seq("d2"))
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("y")).cast("decimal(38,0)").as("sx"),
        sum(col("y2")).cast("decimal(38,0)").as("sy"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("sxx"),
        sum(col("y2").cast("decimal(38,0)") * col("y2")).as("syy"),
        sum(col("y").cast("decimal(38,0)") * col("y2")).as("sxy"))
      .select(col("lag"), col("n").cast("long").as("n_pairs"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("vx"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("vy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double").as("cov"))
      // zero-variance legs (a constant series at some lag) → NULL, the
      // engine-independent verdict: Spark and DuckDB disagree on
      // NaN-vs-NULL for degenerate float division (the hourly_anomalies
      // lesson), so neither value may reach the output
      .select(col("lag"), col("n_pairs"),
        when(col("vx") > 0 && col("vy") > 0,
          round(col("cov") / sqrt(col("vx") * col("vy")), 4)).as("acf"))
  }

  /** Single-split CHANGEPOINT scan of daily revenue — exact binary
    * segmentation, one level: the split date maximizing the
    * between-segment sum of squares S²_L/n_L + S²_R/n_R − S²/N (the
    * classic least-squares changepoint statistic, scanned over EVERY
    * candidate day — the exact complement of [[changepointCusum]]'s
    * streaming-style detector). Reports the best split with both
    * segment means.
    *
    * Exactness: prefix sums are exact decimals over the calendar-
    * bounded daily table; each candidate's gain is the same fixed
    * double expression in both engines (identical inputs → identical
    * doubles → identical argmax), with ties broken by earliest date;
    * segment means are truncated integer micro-cents.
    *
    * Scale: one Memo-shared daily rollup; the scan is a window + a
    * top-1 over ≤ ~2.6k candidate rows at any SF.
    */
  def changepointSingleSplit(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders).select(col("d"), col("y"))
    val tot = daily.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("y")).cast("decimal(38,0)").as("s"))
    val dW = Window.orderBy(col("d")) // calendar-bounded input
    daily
      .withColumn("sl", sum(col("y").cast("decimal(38,0)")).over(
        dW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nl", row_number().over(dW).cast("decimal(38,0)"))
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("n"))
      .withColumn("sr", expr("s - sl"))
      .withColumn("nr", expr("n - nl"))
      .withColumn("gain", expr(
        """cast(sl as double) * cast(sl as double) / cast(nl as double)
          | + cast(sr as double) * cast(sr as double) / cast(nr as double)
          | - cast(s as double) * cast(s as double) / cast(n as double)"""
          .stripMargin))
      .orderBy(col("gain").desc, col("d"))
      .limit(1)
      .select(col("d").as("split_after"),
        col("nl").cast("long").as("n_left"),
        col("nr").cast("long").as("n_right"),
        expr("(sl * 1000000) div nl").cast("long").as("mean_left_micro"),
        expr("(sr * 1000000) div nr").cast("long").as("mean_right_micro"),
        round(col("gain") / lit(1e4), 2).as("gain_usd2_r2"))
  }

  /** PARTIAL autocorrelation function (lags 1..maxLag) of daily revenue
    * — the AR-order diagnostic [[acfDailyRevenue]] cannot give: PACF(k)
    * is the correlation at lag k AFTER the intermediate lags are
    * regressed out, so an AR(p) series cuts off after lag p where the
    * raw ACF merely decays. Classic Box–Jenkins model identification.
    *
    * Exactness: the autocovariance ratios ρ_k = A_k/A_0 come from exact
    * DECIMAL(38,0) numerators (the ȳ-centered products expanded through
    * ×N² so no rational mean ever materializes: A_k = N²Σxy −
    * N·S·(Σhead+Σtail) + n_k·S², calendar-bounded N keeps everything
    * inside 38 digits); the Durbin–Levinson recursion is UNROLLED from
    * [[graft.OracleSql.levinsonSteps]] — the SAME expression strings
    * feed Spark's expr and the DuckDB oracle, so the IEEE double trees
    * cannot drift. A non-positive prediction error (degenerate series)
    * yields NULL from that order on; a zero-variance series yields NULL
    * everywhere.
    *
    * Scale: one Memo-shared daily rollup; the pair join and per-lag agg
    * run on the calendar-bounded daily table; the recursion is a 1-row
    * projection.
    */
  def pacfDailyRevenue(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = OpUtils.dailyFact(orders).select(col("d"), col("y"))
    val tot = daily.agg(count(lit(1)).cast("decimal(38,0)").as("nn"),
      sum(col("y")).cast("decimal(38,0)").as("s"),
      sum(col("y").cast("decimal(38,0)") * col("y")).as("q"))
    val pairs = daily
      .select(col("d"), col("y"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("d2", date_add(col("d"), col("lag")))
      .join(daily.select(col("d").as("d2"), col("y").as("y2")), Seq("d2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("y")).cast("decimal(38,0)").as("sx"),
        sum(col("y2")).cast("decimal(38,0)").as("sy"),
        sum(col("y").cast("decimal(38,0)") * col("y2")).as("sxy"))
    val pivots = (1 to maxLag).flatMap(k => Seq(
      sum(when(col("lag") === k, col("n"))).as(s"n$k"),
      sum(when(col("lag") === k, col("sx"))).as(s"hx$k"),
      sum(when(col("lag") === k, col("sy"))).as(s"hy$k"),
      sum(when(col("lag") === k, col("sxy"))).as(s"xy$k")))
    val one = pairs.agg(pivots.head, pivots.tail: _*)
      .crossJoin(broadcast(tot))
      .withColumn("a0", expr("nn * nn * q - nn * s * s"))
    val withR = (1 to maxLag).foldLeft(one) { (df, k) =>
      df.withColumn(s"a$k",
          expr(s"nn * nn * xy$k - nn * s * (hx$k + hy$k) + n$k * s * s"))
        .withColumn(s"r$k", expr(
          s"""case when a0 > 0 and n$k is not null
             | then cast(a$k as double) / cast(a0 as double) end"""
            .stripMargin))
    }
    val withPhi = graft.OracleSql.levinsonSteps(maxLag)
      .foldLeft(withR) { case (df, (name, sql)) => df.withColumn(name, expr(sql)) }
    withPhi.selectExpr(s"stack($maxLag, " +
      (1 to maxLag).map(k => s"cast($k as bigint), round(p_${k}_$k, 6)")
        .mkString(", ") + ") as (lag, pacf_r6)")
  }

  /** Open-order backlog timeline — interval-overlap counting: how many
    * orders were open (placed, not yet fully shipped) on each day. The
    * classic sweep-line reformulation keeps it distributed: +1 events at
    * order dates and −1 events at each order's LAST ship date are both
    * fact-sized grouped aggs (map-side combined to date-grain), and the
    * running backlog is a prefix sum over the DATE-grain timeline —
    * bounded by the calendar span like [[dailyGapfill]], never by order
    * count. Orders with no shipped lines never close (stay in backlog).
    */
  def orderBacklogTimeline(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val opens = OpUtils.dailyFact(orders)
      .select(col("d"), col("m").as("n_opened"))
    val closes = lineitem
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      .groupBy(col("l_orderkey"))
      .agg(max(col("sd")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_closed"))
    opens.join(closes, Seq("d"), "full_outer")
      .select(col("d"),
        coalesce(col("n_opened"), lit(0L)).as("n_opened"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
      .withColumn("open_backlog",
        sum(col("n_opened") - col("n_closed")).over(
          Window.orderBy(col("d"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Daily revenue with the calendar gaps filled in: a generated date
    * spine (no driver collect — the min/max bounds stay a 1-row
    * DataFrame cross-joined in, which Spark broadcasts) left-joined to
    * the per-day rollup, zero-filled counts, and a forward-filled
    * last-known average order value (`last(_, ignoreNulls)` running
    * window).
    *
    * Scale: the spine is bounded by the CALENDAR SPAN (days), never the
    * row count — the single-partition ordered window runs over ~10³
    * rows regardless of fact size; everything fact-sized is map-side
    * combined before it.
    */
  def dailyGapfill(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
      .select(col("d"), col("m").as("n_orders"), col("y").as("cents"))
    val bounds = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = bounds
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    spine.join(daily, Seq("d"), "left")
      .withColumn("avg_cents",
        when(col("n_orders") > 0, expr("cents div n_orders")))
      .withColumn("filled_avg_cents",
        last(col("avg_cents"), ignoreNulls = true).over(
          Window.orderBy(col("d"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("d"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        round(coalesce(col("cents"), lit(0L)) / 100.0, 2).as("revenue"),
        round(col("filled_avg_cents") / 100.0, 2).as("avg_order_value_ffill"))
  }

  /** Exponentially weighted moving average of daily revenue with
    * binary weights 2⁷…2⁰ over the 8 most recent trading days — the
    * truncated-EWMA smoother dashboards run over warehouse rollups.
    * Power-of-two weights keep every numerator/denominator an EXACT
    * integer (cents × 2ᵏ), so the smoothed series is engine- and
    * partition-order-stable; the single final division is one IEEE
    * double op, identical in both engines.
    *
    * Series heads renormalize: the denominator sums only the weights of
    * lags that exist, so day 1's EWMA equals day 1's revenue (no zero
    * padding bias).
    *
    * Scale: the fact collapses to a date-grain rollup first (map-side
    * combined), so the ordered lag window runs over CALENDAR-SPAN rows
    * (~10³ for years of data) regardless of fact size — same bound as
    * [[dailyGapfill]].
    */
  /** Longest above-average revenue streaks — the gaps-and-islands
    * pattern (consecutive-run detection by the d − row_number() island
    * key), the classic warehouse idiom for "how long did the hot streak
    * last" that plain aggregation cannot express.
    *
    * Exactness: the above-mean test is the division-free cents·n > S in
    * DECIMAL(38,0) — no float mean, so membership (and therefore every
    * island) is engine- and partition-order-exact.
    *
    * Scale: the fact collapses to the date-grain rollup first; islands,
    * streak stats, and the top-k rank all run over CALENDAR-SPAN rows.
    */
  def revenueStreaks(orders: DataFrame, topK: Int = 10): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
      .select(col("d"), col("y").as("cents"))
    val full = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val above = daily
      .withColumn("n", count(lit(1)).over(full).cast("decimal(38,0)"))
      .withColumn("s", sum(col("cents").cast("decimal(38,0)")).over(full))
      .filter(col("cents").cast("decimal(38,0)") * col("n") > col("s"))
    above
      .withColumn("island",
        date_sub(col("d"), row_number().over(Window.orderBy(col("d")))))
      .groupBy(col("island"))
      .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
        count(lit(1)).as("n_days"),
        sum(col("cents").cast("decimal(38,0)")).as("streak_cents"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("n_days").desc, col("streak_start")))
          .cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("streak_start"), col("streak_end"), col("n_days"), col("rnk"),
        round(col("streak_cents").cast("double") / 100.0, 2).as("revenue"))
  }

  /** CUSUM changepoint scan over daily revenue: the day where the
    * cumulative deviation from the series mean peaks is the most likely
    * single level-shift point (Page's classic statistic, offline form) —
    * the "when did the business change" question behind every dashboard
    * trend annotation.
    *
    * Exactness: with S = Σcents and n = #days, the running statistic is
    * n·prefix_t − t·S — every term an exact DECIMAL(38,0) integer (no
    * mean division, so no rounding anywhere the RANKING depends on;
    * cents prefixes at 100 TB reach ~10¹⁷ and n· products cross 2⁶³).
    * The displayed per-day-mean deviation divides once, in IEEE doubles,
    * identically in both engines.
    *
    * Scale: the fact collapses to the date-grain rollup first (map-side
    * combined); the ordered windows then run over CALENDAR-SPAN rows
    * regardless of fact size — same bound as [[dailyGapfill]].
    */
  def changepointCusum(orders: DataFrame, topK: Int = 10): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
      .select(col("d"), col("y").as("cents"))
    val ordered = Window.orderBy(col("d"))
    val full = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val scored = daily
      .withColumn("t", row_number().over(ordered).cast("decimal(38,0)"))
      .withColumn("prefix",
        sum(col("cents").cast("decimal(38,0)"))
          .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(full).cast("decimal(38,0)"))
      .withColumn("s", sum(col("cents").cast("decimal(38,0)")).over(full))
      .withColumn("cusum", col("n") * col("prefix") - col("t") * col("s"))
    scored
      .withColumn("rnk",
        row_number().over(Window.orderBy(abs(col("cusum")).desc, col("d")))
          .cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("d"), col("rnk"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("cusum").cast("double") / col("n").cast("double") / 100.0, 2)
          .as("cusum_dollars"))
  }

  def ewmaDailyRevenue(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
      .select(col("d"), col("m").as("n_orders"), col("y").as("cents"))
    val w = Window.orderBy(col("d"))
    val lags = (0 until 8).map(k => (lag(col("cents"), k).over(w), 1L << (7 - k)))
    val num = lags.map { case (c, wt) => coalesce(c * wt, lit(0L)) }.reduce(_ + _)
    val den = lags.map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    daily
      .withColumn("ewma_cents_num", num)
      .withColumn("ewma_den", den)
      .select(col("d"), col("n_orders"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("ewma_cents_num") / col("ewma_den") / 100.0, 2)
          .as("ewma_revenue"))
  }

  /** Holt(α=β=½) weights over the last 8 observations, computed ONCE by
    * exact integer recurrence: with dyadic smoothing constants every
    * level/trend value is an integer combination of y_{t-7..t} over the
    * common denominator 4⁷ = 2¹⁴, so the whole recurrence collapses to
    * two dot products with these literal weights — no sequential scan,
    * and bit-identical in the oracle (which interpolates the SAME
    * longs). Returns (levelWeights, trendWeights, denominator), index 0
    * = oldest observation.
    */
  private[graft] lazy val holtWeights: (Seq[Long], Seq[Long], Long) = {
    var l = Array.tabulate(8)(j => if (j == 0) BigInt(1) else BigInt(0))
    var b = Array.fill(8)(BigInt(0))
    var den = BigInt(1)
    for (i <- 1 to 7) {
      val e = Array.tabulate(8)(j => if (j == i) den else BigInt(0))
      // l_i = (y_i + l_{i-1} + b_{i-1}) / 2          → denominator 2·den
      val lNew = Array.tabulate(8)(j => e(j) + l(j) + b(j))
      // b_i = ((l_i − l_{i-1}) + b_{i-1}) / 2        → denominator 4·den
      val bNew = Array.tabulate(8)(j => lNew(j) - 2 * l(j) + 2 * b(j))
      l = lNew.map(_ * 2) // rescale level to the common 4·den
      b = bNew
      den *= 4
    }
    (l.map(_.toLong).toSeq, b.map(_.toLong).toSeq, den.toLong)
  }

  /** Truncated Holt linear-trend forecast over daily revenue — the
    * h-step-ahead projection that completes the time-series suite
    * (EWMA smooths, ACF diagnoses, OLS fits the global line, Holt
    * extrapolates the LOCAL level+trend). Initialized 8 observations
    * back (level = y, trend = 0) like the truncated EWMA, which turns
    * the sequential recurrence into two literal-weight dot products
    * over lag columns (see [[holtWeights]]) — exact integer cents until
    * one final display division, engine-stable. Rows without 8 prior
    * observations are dropped (no partially-initialized forecasts).
    * Scale: one fact-sized map-side-combined rollup; the lag window
    * runs over the CALENDAR-bounded daily table. Gap days are simply
    * absent (the EWMA convention): the window is the last 8
    * OBSERVATIONS, not calendar days.
    */
  def holtForecast(orders: DataFrame): DataFrame = {
    val (lw, bw, den) = holtWeights
    val daily = OpUtils.dailyFact(orders)
      .select(col("d"), col("y").as("cents"))
    val w = Window.orderBy(col("d"))
    val lagCols = (0 to 7).map(j => lag(col("cents"), 7 - j).over(w))
    val complete = lagCols.map(_.isNotNull).reduce(_ && _)
    val sl = lagCols.zip(lw).map { case (c, wt) => c * wt }.reduce(_ + _)
    val sb = lagCols.zip(bw).map { case (c, wt) => c * wt }.reduce(_ + _)
    val scale = den * 100.0
    daily
      .withColumn("ok", complete)
      .withColumn("sl", sl).withColumn("sb", sb)
      .filter(col("ok"))
      .select(col("d"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("sl") / scale, 2).as("holt_level"),
        round(col("sb") / scale, 2).as("holt_trend"),
        round((col("sl") + col("sb")) / scale, 2).as("forecast_next"),
        round((col("sl") + lit(7L) * col("sb")) / scale, 2).as("forecast_7d"))
  }

  /** Per-event running 3σ anomaly flags over each event type's value
    * stream — the metric-monitor primitive. Each event is judged against
    * the EXACT prefix statistics of its type's earlier history (n, Σx,
    * Σx² in cents, current row excluded): anomalous iff n ≥ minPrior and
    * (x·n − S)² > z²·(n·Q − S²) — the z-score inequality cleared of
    * divisions, every term an integer in DECIMAL(38,0), so the verdict is
    * bit-stable across engines and partitionings ((x·n−S)² crosses 2⁶³
    * while still inside any realistic corpus).
    *
    * Scale: a window partitioned only by event TYPE funnels each type's
    * whole history into one task. The prefix statistics factor exactly
    * through DAY segments (the two-level prefix-sum pattern): per-
    * (type, day) totals carry the cross-day offset via a window over
    * DAY SUMMARIES only (calendar-bounded), and the within-day running
    * prefix partitions by (type, day), so it parallelizes with the
    * calendar. Day order refines (ts, event_id) order, so the
    * decomposed prefix equals the global one row-for-row; finer
    * granularity (hour/minute) is the knob for hotter streams, and the
    * truly unbounded path is the streaming family member
    * ([[graft.streaming.EventStreams.onlineAnomalyStream]]): verdicts
    * from O(1) prefix state per key, no sort, no history retained.
    */
  def rollingAnomalyFlags(events: DataFrame, z: Int = 3,
      minPrior: Int = 30): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val dec0 = lit(0).cast("decimal(38,0)")
    val cents = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"),
        floor(col("value") * lit(100.0)).cast("long").as("value_cents"))
      .withColumn("day", to_date(col("ts")))
    // level 1: per-(type, day) moment totals → offsets over strictly-
    // earlier days (day-summary grain, calendar-bounded per type)
    val wDays = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cents.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("d_n"),
        sum(dec(col("value_cents"))).as("d_s"),
        sum(dec(col("value_cents")) * dec(col("value_cents"))).as("d_q"))
      .withColumn("o_n", coalesce(sum(col("d_n")).over(wDays), lit(0L)))
      .withColumn("o_s", coalesce(sum(col("d_s")).over(wDays), dec0))
      .withColumn("o_q", coalesce(sum(col("d_q")).over(wDays), dec0))
      .select(col("event_type"), col("day"), col("o_n"), col("o_s"), col("o_q"))
    // level 2: within-day running prefix, partitioned by (type, day)
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cents
      .withColumn("w_n", coalesce(count(col("value_cents")).over(w), lit(0L)))
      .withColumn("w_s", coalesce(sum(dec(col("value_cents"))).over(w), dec0))
      .withColumn("w_q", coalesce(
        sum(dec(col("value_cents")) * dec(col("value_cents"))).over(w), dec0))
      .join(offsets, Seq("event_type", "day"))
      .withColumn("n_prior", col("o_n") + col("w_n"))
      .withColumn("s", col("o_s") + col("w_s"))
      .withColumn("q", col("o_q") + col("w_q"))
      .withColumn("dev", dec(col("value_cents")) * col("n_prior") - col("s"))
      .withColumn("is_anomaly", col("n_prior") >= minPrior &&
        col("dev") * col("dev") > lit(z * z) *
          (col("n_prior") * col("q") - col("s") * col("s")))
      .select(col("event_id"), col("event_type"), col("value_cents"),
        col("n_prior"), col("is_anomaly"))
  }

  /** Order-arrival burstiness: the Fano dispersion index of the daily
    * order count, F = var/mean — ≈10⁶ micro-units for a Poisson arrival
    * process, ≫10⁶ for bursty/campaign-driven traffic, ≪10⁶ for
    * throttled/quota'd feeds. The capacity-planning statistic behind
    * "can the nightly load assume smooth arrivals". Exact integers end
    * to end: F = (n·Σc² − S²) / (S·(n−1)) cross-multiplied in
    * DECIMAL(38,0) (Σc² crosses 2⁶³ at lake-scale daily volumes) with
    * one final integral division; the numerator is nonnegative by
    * Cauchy–Schwarz, so truncation is floor in both engines.
    *
    * Scale: one fact-sized map-side-combined rollup to the calendar
    * grain, then a 1-row fold. Degenerate histories (<2 days or zero
    * orders) yield no row rather than a division error.
    */
  def orderArrivalDispersion(orders: DataFrame): DataFrame =
    OpUtils.dailyFact(orders).select(col("m").as("c"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("q"))
      .filter(col("n") >= 2 && col("s") >= 1)
      .select(col("n").as("n_days"), col("s").as("n_orders"),
        expr("(1000 * s) div n").as("mean_milli"),
        expr("""cast(((cast(n as decimal(38,0)) * q
            - cast(s as decimal(19,0)) * s) * 1000000)
          div (cast(s as decimal(19,0)) * (n - 1)) as bigint)""")
          .as("fano_micro"))

  /** The per-weekday distinct-revenue CDF over [[OpUtils.dailyFact]] —
    * (dow, y, c, cum, total), Memo-shared by the weekday envelope and
    * the weekday outlier scan (both need the same per-dow order
    * statistics). Calendar-bounded: ≤ one row per distinct (weekday,
    * daily-revenue) pair at any SF.
    */
  private def dowRevenueCdf(orders: DataFrame): DataFrame =
    Memo.cached("dow_revenue_cdf", orders) { o =>
      val dowW = Window.partitionBy(col("dow"))
      OpUtils.dailyFact(o)
        .select((weekday(col("d")) + 1).cast("long").as("dow"), col("y"))
        .groupBy(col("dow"), col("y")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(dowW.orderBy(col("y"))))
        .withColumn("total", sum(col("c")).over(dowW))
    }

  /** Weekday revenue ENVELOPE: exact P10/P50/P90 of daily revenue per
    * weekday — the seasonal band a monitoring dashboard draws before
    * any anomaly rule fires (and the distributional companion to the
    * Kruskal–Wallis verdict that the weekdays differ). Type-1
    * (lower) quantiles via integer rank probes on the shared per-dow
    * CDF — division-free, engine-stable, one conditional-min pass.
    */
  def weekdayRevenueEnvelope(orders: DataFrame): DataFrame =
    dowRevenueCdf(orders).groupBy(col("dow"))
      .agg(max(col("total")).as("n_days"),
        min(when(col("cum") * 10 >= col("total"), col("y"))).as("p10_cents"),
        min(when(col("cum") * 2 >= col("total"), col("y"))).as("p50_cents"),
        min(when(col("cum") * 10 >= col("total") * 9, col("y")))
          .as("p90_cents"))

  /** Weekday-seasonal OUTLIER days: days whose revenue sits more than
    * k×MAD from THEIR WEEKDAY's median — the robust anomaly scan that
    * a raw global z-score gets wrong twice (weekends would all flag,
    * and real spikes would inflate the sd that judges them). All
    * integer-cent comparisons (dev > k·mad, never a ratio); a
    * zero-MAD weekday (over half its days identical) flags any
    * nonzero deviation, the documented degenerate convention.
    *
    * Scale: one Memo-shared daily rollup + the shared per-dow CDF;
    * the MAD re-grain and the flag scan run on the calendar-bounded
    * daily table.
    */
  def weekdayOutlierDays(orders: DataFrame, k: Int = 3): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
      .select(col("d"), (weekday(col("d")) + 1).cast("long").as("dow"),
        col("y"))
    val med = dowRevenueCdf(orders).groupBy(col("dow"))
      .agg(min(when(col("cum") * 2 >= col("total"), col("y"))).as("med"))
    val dev = daily.join(broadcast(med), Seq("dow"))
      .select(col("d"), col("dow"), col("y"), col("med"),
        abs(col("y") - col("med")).as("dev"))
    val dowW = Window.partitionBy(col("dow"))
    val mad = dev.groupBy(col("dow"), col("dev")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(dowW.orderBy(col("dev"))))
      .withColumn("total", sum(col("c")).over(dowW))
      .groupBy(col("dow"))
      .agg(min(when(col("cum") * 2 >= col("total"), col("dev"))).as("mad"))
    dev.join(broadcast(mad), Seq("dow"))
      .filter(col("dev") > col("mad") * k && col("dev") > 0)
      .select(col("d"), col("dow"), col("y").as("revenue_cents"),
        col("med").as("dow_median_cents"), col("mad").as("dow_mad_cents"),
        col("dev").as("abs_dev_cents"))
  }

  /** Tukey MEDIAN POLISH of the week × weekday revenue grid (two fixed
    * sweeps): the robust two-way decomposition y = week_effect +
    * weekday_effect + residual, where every effect is a MEDIAN — so one
    * anomalous day perturbs only its own residual, never the seasonal
    * effects that judge it (the additive-decomposition complement of
    * [[weekdayOutlierDays]]' marginal rule). Reports the topK cells by
    * |residual| — the days that remain anomalous AFTER both seasonal
    * effects are removed.
    *
    * Exactness: the variant is pinned — exactly two (row sweep, column
    * sweep) passes, lower medians, no grand-effect folding — and every
    * median is an exact order statistic of integer cents
    * (element_at(sort_array(...), (n+1) div 2), arrays bounded by 7 for
    * rows and the calendar week count for columns), so residuals are
    * exact integers and the topK selection (ties → (w, dow) asc) is
    * deterministic in both engines.
    *
    * Scale: one Memo-shared daily rollup; the four sweep aggs and
    * effect joins run on the calendar-bounded grid (≤ ~2.6k cells at
    * any SF), each effect table broadcast.
    */
  def medianPolishWeekday(orders: DataFrame, topK: Int = 20): DataFrame = {
    val lowerMed = expr(
      "element_at(sort_array(collect_list(res)), " +
        "cast((count(res) + 1) div 2 as int))")
    def sweep(df: DataFrame, key: String, out: String): DataFrame = {
      val m = df.groupBy(col(key)).agg(lowerMed.as(out))
      df.join(broadcast(m), Seq(key))
        .withColumn("res", col("res") - col(out))
    }
    val g0 = OpUtils.dailyFact(orders)
      .select(col("d"), expr("t div 7").as("w"),
        (weekday(col("d")) + 1).cast("long").as("dow"), col("y").as("res"),
        col("y"))
    val g4 = Seq(("w", "dr1"), ("dow", "dc1"), ("w", "dr2"), ("dow", "dc2"))
      .foldLeft(g0) { case (df, (key, out)) => sweep(df, key, out) }
    g4.select(col("d"), col("w"), col("dow"),
        col("y").as("revenue_cents"),
        (col("dr1") + col("dr2")).as("week_effect_cents"),
        (col("dc1") + col("dc2")).as("dow_effect_cents"),
        col("res").as("residual_cents"))
      .orderBy(abs(col("residual_cents")).desc, col("w"), col("dow"))
      .limit(topK)
  }

  /** Cross-correlogram between daily ORDER COUNT and daily REVENUE —
    * the lead–lag diagnostic [[acfDailyRevenue]] cannot answer: does
    * order volume lead revenue (inventory pipeline), lag it
    * (replenishment), or move contemporaneously? For each lag k in
    * [−maxLag, maxLag], Pearson r between (m_d, y_{d+k}) over the days
    * where both sides exist; k > 0 means order count LEADS revenue by
    * k days. Exactness follows the ACF contract verbatim: the six
    * sufficient sums are exact integers in DECIMAL(38,0) (cents²
    * products cross 2⁶³ long before 100 TB), the final r is one IEEE
    * division/sqrt from those integers, and zero-variance legs yield
    * NULL — the engine-independent verdict — never NaN.
    *
    * Scale: the fact contributes exactly one pass (the Memo-shared
    * [[OpUtils.dailyFact]] rollup); the ×(2·maxLag+1) explode, the
    * shifted-date self-join, and the per-lag agg all run on the
    * CALENDAR-bounded daily table, never the fact.
    */
  def ccfOrdersRevenue(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = OpUtils.dailyFact(orders).select(col("d"), col("y"), col("m"))
    val shifted = daily
      .select(col("d"), col("m").as("x"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
      .withColumn("d2", date_add(col("d"), col("lag")))
    shifted
      .join(daily.select(col("d").as("d2"), col("y").as("y2")), Seq("d2"))
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y2")).cast("decimal(38,0)").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y2").cast("decimal(38,0)") * col("y2")).as("syy"),
        sum(col("x").cast("decimal(38,0)") * col("y2")).as("sxy"))
      .select(col("lag"), col("n").cast("long").as("n_pairs"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("vx"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("vy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double").as("cov"))
      .select(col("lag"), col("n_pairs"),
        when(col("vx") > 0 && col("vy") > 0,
          round(col("cov") / sqrt(col("vx") * col("vy")), 4)).as("ccf"))
  }

  /** Matrix-profile DISCORD scan of daily revenue (Keogh's matrix
    * profile, the exact-integer edition): for every complete `m`-day
    * window, the profile value is the minimum sum-of-squared-differences
    * to ANY other non-overlapping complete window; the top-`topK`
    * windows by that minimum are the discords — the week-shapes least
    * like any other week in the history, the complement of
    * [[graft.operators.StatOps.revenueMotifs]]' "most repeated shapes".
    *
    * Exactness: SSDs are DECIMAL(38,0) sums of squared cent differences
    * (a squared daily-revenue difference passes 2⁶³ at lake scale);
    * ranking and the non-overlap exclusion (|i−j| ≥ m, the standard
    * trivial-match guard) happen on those exact integers with ties by
    * window start. The reported L2 distance is the EXACT integer square
    * root of the profile SSD (double seed → one integer Newton step →
    * ±1 correction with decimal-checked squares — the abWilsonBounds
    * discipline, exact even past √ssd > 2⁵³ where the bare double
    * seed drifts by more than 1).
    *
    * Scale: windows pivot from ONE k-explode of the Memo-shared daily
    * fact (no ORDER-BY window functions); the pair scan is a broadcast
    * nested-loop over the CALENDAR-bounded window table (≤ days²/2
    * pairs at ANY SF — the day-pair-table shape); the profile min is a
    * map-side-combined rollup of the pair endpoints.
    */
  def revenueDiscords(orders: DataFrame, m: Int = 7,
      topK: Int = 5): DataFrame = {
    require(m >= 2 && topK >= 1)
    val daily = OpUtils.dailyFact(orders).select(col("t"), col("d"), col("y"))
    val win = daily
      .select(col("t"), col("d"), col("y"),
        explode(sequence(lit(0), lit(m - 1))).as("k"))
      .select((col("t") - col("k")).as("i"), col("k"), col("y"), col("d"))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("nk"),
        max(when(col("k") === 0, col("d"))).as("d_start") +:
          (0 until m).map(k =>
            max(when(col("k") === k, col("y"))).as(s"y_$k")): _*)
      .filter(col("nk") === m)
    // spread the probe side: the window pivot AQE-coalesces to ONE
    // partition (~2.4k rows), and the broadcast NLJ pair scan — ~2.9M
    // pairs × m decimal squared-diffs — otherwise runs single-task
    // (profiled 3.9 s one-threaded at sf0.1 vs ~0.3 s spread)
    val winP = OpUtils.spread(win)
    val a = winP.select(col("i").as("ia") +:
      (0 until m).map(k => col(s"y_$k").as(s"ya_$k")): _*)
    val b = win.select(col("i").as("ib") +:
      (0 until m).map(k => col(s"y_$k").as(s"yb_$k")): _*)
    val ssd = (0 until m)
      .map(k => s"cast(ya_$k - yb_$k as decimal(38,0)) * (ya_$k - yb_$k)")
      .mkString(" + ")
    val pairs = a.join(broadcast(b), col("ib") >= col("ia") + m)
      .withColumn("ssd", expr(ssd))
    val mp = pairs
      .select(explode(array(
        struct(col("ia").as("i"), col("ssd")),
        struct(col("ib").as("i"), col("ssd")))).as("e"))
      .select(col("e.i").as("i"), col("e.ssd").as("ssd"))
      .groupBy(col("i")).agg(min(col("ssd")).as("mp"))
    // the isqrt projects BEFORE the sort so orderBy+limit compiles to
    // TakeOrderedAndProject (a post-limit multi-reference projection
    // blocks the pattern and degrades to a range-partitioned sort —
    // caught by the global-sort plan sweep); ≤ days rows pay the sqrt
    win.select(col("i"), col("d_start"))
      .join(mp, Seq("i"))
      .withColumn("s1", expr("cast(floor(sqrt(cast(mp as double))) as bigint)"))
      // one integer Newton step before the ladder (the abWilsonBounds
      // fix): the double seed alone drifts >1 once √mp passes 2⁵³;
      // mp = 0 (identical windows) must skip the step — division guard
      .withColumn("s2",
        expr("case when s1 <= 0 then s1 else (s1 + (mp div s1)) div 2 end"))
      .withColumn("l2_dist_cents", expr("""cast(case
        | when cast(s2 + 1 as decimal(38,0)) * (s2 + 1) <= mp then s2 + 1
        | when cast(s2 as decimal(38,0)) * s2 > mp then s2 - 1
        | else s2 end as bigint)""".stripMargin.replaceAll("\n", " ")))
      .orderBy(col("mp").desc, col("i"))
      .limit(topK)
      .select(col("i").as("t_start"), col("d_start"), col("l2_dist_cents"))
  }
}
