package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

private[graft] object OpUtils {
  /** Spread a (possibly single-split) input across all cores before a
    * CPU-dense per-row stage — on a cluster, upstream files usually give
    * enough splits, but a scan with fewer splits than cores would
    * otherwise serialize the hashing work on one task.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact quantile bucketing via the distinct-value CDF — the
    * scale-safe substitute for a global ntile (which would
    * single-partition-sort every ROW): group rows by value, cumulative-
    * sum counts over the DISTINCT-value table only, and assign
    * bucket = ⌊(first_rank−1)·k / N⌋ + 1, so a tie group lands wholly in
    * its first member's bucket (deterministic without a per-row total
    * order). Returns the distinct-value table (valueCol, n, bucket).
    * Callers must quantize continuous domains first (floor to
    * dollars/micro-units) or the distinct table is corpus-sized.
    * Shared by perplexity_buckets and order_value_deciles — one
    * definition of the quantile semantics, not two.
    */
  /** Cumulative sum of `weightCol` in `valueCol` order over a
    * DISTINCT-VALUE-grain table, in TWO bounded window levels (the
    * theil_sen_cdf / skyline pattern): values range-bucket into ≤1025
    * buckets — truncating division on the non-negative shift is
    * monotonic, so bucket order is value order — the cross-bucket
    * prefix rides a window over BUCKET SUMMARIES only, and the
    * within-bucket cumulative partitions by bucket. No unpartitioned
    * window ever sees the full grid, so a wide value domain degrades
    * to parallel bucket work, never one straggler task. Returns the
    * input columns plus `cum`. `valueCol` must be integral.
    */
  def twoLevelCum(df: DataFrame, valueCol: String, weightCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val gc = groupCols.map(col)
    // with groupCols the whole construction runs per group (per-group
    // range, per-group bucket grid, prefix windows partitioned by the
    // group) — several CDFs over different value domains build in ONE
    // pass instead of one derivation each
    val rng =
      if (groupCols.isEmpty)
        df.agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
      else df.groupBy(gc: _*)
        .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    val withRng =
      if (groupCols.isEmpty) df.crossJoin(broadcast(rng))
      else df.join(broadcast(rng), groupCols)
    val bucketed = withRng
      .withColumn("__bucket", expr(
        s"($valueCol - __lo) div " +
          "greatest(cast(1 as bigint), (__hi - __lo) div 1024 + 1)"))
    val bucketTotals = bucketed
      .groupBy((gc :+ col("__bucket")): _*)
      .agg(sum(col(weightCol)).as("__bn"))
      .withColumn("__prior", coalesce(sum(col("__bn")).over(
        Window.partitionBy(gc: _*).orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((groupCols.map(c => col(c).as(s"__g_$c")) :+
        col("__bucket").as("__bkt") :+ col("__prior")): _*)
    val joinCond = (groupCols.map(c => col(c) === col(s"__g_$c")) :+
      (col("__bucket") === col("__bkt"))).reduce(_ && _)
    bucketed
      .withColumn("__incum", sum(col(weightCol)).over(
        Window.partitionBy((gc :+ col("__bucket")): _*).orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(bucketTotals), joinCond)
      .withColumn("cum", col("__prior") + col("__incum"))
      .drop("__lo", "__hi", "__bucket", "__bkt", "__prior", "__incum")
      .drop(groupCols.map(c => s"__g_$c"): _*)
  }

  /** THE daily order-fact rollup, Memo-shared by the whole daily-ops
    * family (Theil–Sen, Hodges–Lehmann, Kendall τ, runs test, ACF,
    * dispersion, EWMA, Holt, CUSUM, streaks, gapfill, motifs, backlog
    * opens): one fact-sized map-side-combined scan per session per
    * input yields the CALENDAR-bounded table (d date, t day-index,
    * y exact revenue cents, m order count) — ≤ ~2.5k rows for the
    * 7-year history at ANY SF. Before this each member re-derived its
    * own `groupBy(o_orderdate)`, i.e. one redundant full corpus scan
    * per query per session at 100 TB. `o_orderdate` is date-valued
    * (midnight timestamps), so the date grain equals the raw grain.
    */
  def dailyFact(orders: DataFrame): DataFrame =
    Memo.cached("daily_fact", orders) { o =>
      o.groupBy(to_date(col("o_orderdate")).as("d"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("y"),
          count(lit(1)).as("m"))
        .select(col("d"),
          datediff(col("d"), to_date(lit("1992-01-01")))
            .cast("long").as("t"),
          col("y"), col("m"))
    }

  /** The O(days²) day-pair table (tb ≥ ta) over [[dailyFact]], built
    * ONCE per session and shared by every pairwise daily statistic:
    * the Theil–Sen slope CDF filters the diagonal (tb > ta), the
    * Hodges–Lehmann Walsh CDF groups yᵢ+yⱼ, Kendall τ compares the
    * (y, m) sign pattern. Calendar-bounded by construction (≤ ~3M
    * pairs × 6 longs at ANY SF — checkpointable), broadcast on the
    * build's right side so the pair join never shuffles.
    */
  def dayPairs(orders: DataFrame): DataFrame = {
    val daily = dailyFact(orders)
    Memo.cached("day_pairs", daily) { d =>
      val a = d.select(col("t").as("ta"), col("y").as("ya"),
        col("m").as("ma"))
      val b = d.select(col("t").as("tb"), col("y").as("yb"),
        col("m").as("mb"))
      a.join(broadcast(b), col("tb") >= col("ta"))
    }
  }

  /** The exact integer slope expression shared by the Theil–Sen build
    * and its Scaladoc'd oracle mirror: micro-cents-per-day with an
    * explicit sign branch around the truncating division (floor-vs-
    * truncate conventions for negative numerators differ across
    * engines; on the non-negative magnitude they agree).
    */
  private[graft] val slopeMicroSql: String =
    "CASE WHEN yb >= ya THEN " +
      "cast((cast(yb - ya as decimal(38,0)) * 1000000) div (tb - ta) as bigint) " +
      "ELSE -cast((cast(ya - yb as decimal(38,0)) * 1000000) div (tb - ta) as bigint) " +
      "END"

  /** BOTH day-pair medians — the Hodges–Lehmann Walsh-sum median
    * bracket (kind 0: s = yᵢ+yⱼ over tb ≥ ta) and the Theil–Sen slope
    * median bracket (kind 1: s = exact micro slope over tb > ta) — in
    * ONE pass over the Memo-shared [[dayPairs]] table, Memo-shared as
    * `pair_medians`. Returns ≤ 2 rows: (kind, m = pair count, lo =
    * lower central order statistic, hi = upper; lo = hi when m is
    * odd); a kind with zero pairs emits no row.
    *
    * Why medians and not the CDFs: the only consumers
    * ([[graft.operators.StatOps.theilSenTrend]],
    * [[graft.operators.StatOps.hodgesLehmannDaily]]) probe exactly the
    * two central ranks, and the old shape — three memo derivations
    * (slope counts, slope CDF, Walsh CDF) each checkpointing an ~3M-row
    * table the probes then re-scanned — paid ~19 s at sf0.1 for what
    * this derivation answers in one bounded aggregate. The distinct-
    * value groupBy is skipped too (day-pair values are nearly all
    * unique — 5.780M distinct of 5.784M at sf0.1 — so that shuffle
    * reduced nothing and dominated the old build): the raw value
    * stream shuffles ONCE into (kind, bucket) windows, tie arithmetic
    * rides two RANGE frames over the same sort (`cum` counts all peers
    * ≤ s — a RANGE frame ending at CURRENT ROW spans the whole tie
    * group; `n` = cum − count(< s)), and the median filter + min/max
    * collapse everything to the bracket before anything materializes.
    * Calendar-bounded end to end (≤ ~6M in-flight rows × 4 longs at
    * ANY SF); the ≤1025-bucket grid keeps every window partition small,
    * so no single task ever sees a whole value domain.
    */
  def pairMedians(orders: DataFrame): DataFrame =
    Memo.cached("pair_medians", dayPairs(orders)) { p =>
      // pinned: every leg below (range, bucket census, target probe)
      // reads this once-computed value stream
      val events = Memo.managedPersist(
        p.select(explode(when(col("tb") > col("ta"),
            array(
              struct(lit(0L).as("kind"), (col("ya") + col("yb")).as("s")),
              struct(lit(1L).as("kind"), expr(slopeMicroSql).as("s"))))
          .otherwise(array(
            struct(lit(0L).as("kind"), (col("ya") + col("yb")).as("s")))))
          .as("e"))
          .select(col("e.kind").as("kind"), col("e.s").as("s")))
      val rng = events.groupBy(col("kind"))
        .agg(min(col("s")).as("__lo"), max(col("s")).as("__hi"),
          count(lit(1)).as("__m"))
      val bucketed = events.join(broadcast(rng), Seq("kind"))
        .withColumn("__bucket", expr(
          "(s - __lo) div " +
            "greatest(cast(1 as bigint), (__hi - __lo) div 1024 + 1)"))
      // the bucket census (≤ ~2·1025 rows) locates which bucket holds
      // each central rank — rank (m+1) div 2 is the lower statistic,
      // m div 2 + 1 the upper — so the ordered within-bucket pass
      // below touches ONLY the ≤2 target buckets per kind, never the
      // full value stream (a full bucketed window + sort here measured
      // ~10 s at sf0.1 for work two ~4k-row buckets answer)
      val targets = bucketed.groupBy(col("kind"), col("__bucket"))
        .agg(count(lit(1)).as("__bn"), max(col("__m")).as("__tm"))
        .withColumn("__prior", coalesce(sum(col("__bn")).over(
          Window.partitionBy(col("kind")).orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("k1", expr("(__tm + 1) div 2"))
        .withColumn("k2", expr("__tm div 2 + 1"))
        .filter((col("__prior") < col("k1") &&
            col("k1") <= col("__prior") + col("__bn")) ||
          (col("__prior") < col("k2") &&
            col("k2") <= col("__prior") + col("__bn")))
        .select(col("kind").as("__k"), col("__bucket").as("__bkt"),
          col("__prior"), col("__tm"), col("k1"), col("k2"))
      // inner join IS the target-bucket filter (no FilterExec: a filter
      // above this window+join shape measured 15 s where the same
      // arithmetic inside the join/aggregate runs in ~1 s); the two
      // RANGE frames share one WindowExec — RANGE to CURRENT ROW spans
      // the whole tie group, RANGE to -1 stops below it
      val w = Window.partitionBy(col("kind"), col("__bucket"))
        .orderBy(col("s"))
      val probed = bucketed.join(broadcast(targets),
          col("kind") === col("__k") && col("__bucket") === col("__bkt"))
        .withColumn("__cumr", count(lit(1)).over(
          w.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__below", count(lit(1)).over(
          w.rangeBetween(Window.unboundedPreceding, -1)))
        .withColumn("cum", col("__prior") + col("__cumr"))
        .withColumn("n", col("__cumr") - col("__below"))
      val hit = expr("(cum - n < k1 AND k1 <= cum)" +
        " OR (cum - n < k2 AND k2 <= cum)")
      probed.groupBy(col("kind"))
        .agg(max(col("__tm")).as("m"),
          min(when(hit, col("s"))).as("lo"),
          max(when(hit, col("s"))).as("hi"))
    }

  /** The per-priority dollar-grain CDF of order value — (grp, usd, n,
    * cum, total) — Memo-shared by every order-statistic consumer
    * (robust_price_stats' median/MAD/winsor probes, the Brown–Forsythe
    * dispersion test): ONE fact-sized rollup to the (priority, usd)
    * grain per session, not one per query. Bounded by the price DOMAIN
    * (≤ |priorities| × price-range rows at any SF), so the per-group
    * windows and the checkpoint stay dim-sized.
    */
  def priorityUsdCdf(orders: DataFrame): DataFrame =
    Memo.cached("priority_usd_cdf", orders) { o =>
      val grpW = Window.partitionBy(col("grp"))
      o.select(col("o_orderpriority").as("grp"),
          floor(col("o_totalprice")).cast("long").as("usd"))
        .groupBy(col("grp"), col("usd")).agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(grpW.orderBy(col("usd"))))
        .withColumn("total", sum(col("n")).over(grpW))
    }

  def cdfBuckets(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    val byV = df.groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("nd"))
    byV.crossJoin(broadcast(total))
      .withColumn("cum_n", sum(col("n")).over(
        Window.orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bucket", expr(s"((cum_n - n) * $buckets) div nd + 1"))
      .select(col(valueCol), col("n"), col("bucket"))
  }
}
