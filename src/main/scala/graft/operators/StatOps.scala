package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust / resampling statistics over the order history — the
  * outlier-tolerant complement of [[TrendOps]]'s OLS layer (ref: the
  * notebooks' trend analyses, e.g. src/Notebooks/nyc_analysis.ipynb
  * trend cells, which eyeball monthly slopes; here the slope estimate
  * survives the outliers those notebooks filter by hand).
  *
  * Numeric policy (repo-wide): every estimator is exact integer
  * arithmetic in micro-units — order statistics of integer slopes, not
  * float regressions — so partitioning, merge order, and engine can
  * never change a result. Doubles appear only in final display columns
  * via `round`, computed from the same exact integers in both engines.
  */
object StatOps {

  /** Theil–Sen robust trend of daily revenue: the MEDIAN of all pairwise
    * slopes (y_j−y_i)/(t_j−t_i), the classic 29%-breakdown-point slope
    * estimator (Sen 1968) — one revenue spike that would drag OLS barely
    * moves it. Slopes are exact integer micro-cents-per-day with an
    * explicit sign branch around the division (floor-vs-truncate
    * conventions for negative numerators differ across engines; on the
    * non-negative magnitude they agree). The median is reported as the
    * two central order statistics (equal when the pair count is odd) —
    * no averaging division inside the exact columns.
    *
    * Scale: the O(days²) pair join runs on the CALENDAR-bounded daily
    * table (~2.5k rows → ~3M pairs at ANY SF), broadcast on one side —
    * the fact table itself is touched once by [[OpUtils.dailyFact]],
    * and the median bracket comes from the Memo-shared
    * [[OpUtils.pairMedians]] (ONE bucketed-window pass builds this
    * median AND the Hodges–Lehmann one; no per-query CDF scan, no
    * corpus-sized checkpoint, no single-partition pass over the ~3M
    * distinct slopes anywhere).
    */
  def theilSenTrend(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
    // kind 1 = the slope median bracket; zero pairs (<2 distinct days)
    // emit no row, so the crossJoin yields zero rows, matching the
    // oracle (whose empty rank-probe CTEs collapse the comma-join)
    val med = OpUtils.pairMedians(orders).filter(col("kind") === 1L)
    daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(med)) // 1-row × ≤1-row scalar plumbing
      .select(col("n_days"), col("m").as("n_pairs"),
        col("lo").as("slope_lo_micro"), col("hi").as("slope_hi_micro"),
        round((col("lo") + col("hi")).cast("double")
          / 2.0 / 1e6, 4).as("sen_slope_cents_per_day"))
  }

  /** Symbolic motif discovery over daily revenue (the SAX idea with
    * exact-rank symbols): each day maps to its revenue QUARTILE symbol
    * via the distinct-value CDF (deterministic — no z-normalization, no
    * float breakpoints), then every run of three CONSECUTIVE calendar
    * days becomes a motif "q0q1q2" and the motif census is returned
    * (≤ 64 rows). Recurring motifs are the repeated weekly shapes a
    * forecaster should model; rare ones are the anomalies.
    *
    * Scale: symbols and windows live on the calendar-bounded daily
    * table; consecutive days pair through two EQUI-joins on the day
    * index (no global sort, no window over rows).
    */
  def revenueMotifs(orders: DataFrame): DataFrame = {
    // the Memo-shared daily rollup is already a checkpointed leaf, so
    // the old operator-local persist is gone with the redundant scan
    val daily = OpUtils.dailyFact(orders).select(col("t"), col("y"))
    val buckets = OpUtils.cdfBuckets(daily.select(col("y")), "y", 4)
    val sym = daily.join(buckets.select(col("y"), col("bucket")), Seq("y"))
      .select(col("t"), col("bucket").as("q"))
    val s1 = sym.select((col("t") - 1).as("t"), col("q").as("q1"))
    val s2 = sym.select((col("t") - 2).as("t"), col("q").as("q2"))
    sym.join(s1, Seq("t")).join(s2, Seq("t"))
      .groupBy(concat(col("q"), col("q1"), col("q2")).as("motif"))
      .agg(count(lit(1)).as("n_windows"))
  }

  /** Poisson(1) weight from a uniform micro-draw u ∈ [0, 10⁶): inverse-
    * CDF thresholds ⌊10⁶·P(X≤k)⌋ for k = 0..6 (weights cap at 7 —
    * P(X≥7) < 10⁻⁴ is one dropped micro-cell). The thresholds are exact
    * integer literals shared with the oracle, so resampling is a pure
    * function of the hash — no RNG state anywhere.
    */
  private val PoissonCdfMicro = Seq(367879L, 735758L, 919698L, 981011L,
    996340L, 999405L, 999916L)

  private def poissonWeight(u: org.apache.spark.sql.Column) =
    PoissonCdfMicro.zipWithIndex
      .foldRight(lit(7): org.apache.spark.sql.Column) { case ((t, k), e) =>
        when(u < t, k).otherwise(e)
      }

  /** Poisson-bootstrap confidence interval for the mean order value —
    * the distributed bootstrap (Chamandy et al.'s "Estimating uncertainty
    * for massive data streams" / the mapreduce-bootstrap standard): each
    * row joins resample r with weight ~ Poisson(1) derived from
    * hash(key, r), so no resample ever materializes and the pass is ONE
    * scan with a map-side-combined rollup to `resamples` rows. Each
    * resample's mean is an exact integer micro-cent ratio; the CI is the
    * (⌈αR⌉, R+1−⌈αR⌉) order statistics of those R integers (α = 0.05 —
    * rank 4 and 61 of R = 64), picked by rank probes over R rows.
    *
    * Hashing is the CPU bill (measured ~85% of the original
    * one-md5-per-(row, resample) pass), so each row hashes ONCE
    * (x = 32-bit md5 prefix of "bs:key") and the per-resample uniforms
    * come from the universal-hash family u_r = ⌊((a_r·x + b_r) mod P)
    * ·10⁶ / P⌋ — the same engine-portable permutation trick the MinHash
    * signatures use ([[graft.functions.HashFns]]), pure codegen'd
    * integer arithmetic per resample (measured 1.6× end to end at
    * sf0.1, with the md5 count per row down from `resamples` to 1 — the
    * ratio grows with row width at scale). At 100 TB the explode costs
    * `resamples`× arithmetic on one scan but shuffles only R rows per
    * map partition — the reason the Poisson form exists.
    */
  def bootstrapCiOrderValue(orders: DataFrame, resamples: Int = 64): DataFrame = {
    require(resamples >= 20, "need enough resamples for the 5% tails")
    import graft.functions.HashFns.MinhashP
    val y = orders.select(col("o_orderkey"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("y"))
    val point = y.agg(count(lit(1)).as("n_orders"),
      expr("cast((sum(cast(y as decimal(38,0))) * 1000000) div count(1) as bigint)")
        .as("mean_micro"))
    // the constants come from minhashA/minhashB's closed form inlined on
    // r (a 64-element array-of-structs generator here measured 3× slower
    // than the plain sequence explode + scalar arithmetic)
    val aExpr = s"(CASE WHEN (1103515245 * (r + 1) + 12345) % $MinhashP = 0 " +
      s"THEN 1 ELSE (1103515245 * (r + 1) + 12345) % $MinhashP END)"
    val bExpr = s"((69069 * (r + 1) + 1) % $MinhashP)"
    // spread before the resamples× explode: the orders scan is a single
    // split at bench scale, and the whole 64×-explode + universal-hash
    // pass otherwise runs ONE-TASK (profiled 3.4 s single-threaded vs
    // ~0.2 s spread); the repartition moves only the slim (key, y)
    // projection and the per-resample rollup still combines map-side
    val weighted = OpUtils.spread(y)
      .withColumn("x", graft.functions.HashFns.hash32(
        concat(lit("bs:"), col("o_orderkey"))))
      .select(col("y"), col("x"),
        explode(sequence(lit(0L), lit(resamples - 1L))).as("r"))
      .withColumn("w", poissonWeight(expr(
        s"((($aExpr * x + $bExpr) % $MinhashP) * 1000000) div $MinhashP")))
    val means = weighted.groupBy(col("r"))
      .agg(expr("cast((sum(cast(w as decimal(38,0)) * y) * 1000000) div " +
        "nullif(sum(cast(w as bigint)), 0) as bigint)").as("rm"))
      // an all-zero-weight resample (possible only on near-empty input)
      // has no mean; drop it in BOTH engines — Spark ranks NULLs first,
      // DuckDB last, so letting it through breaks parity
      .filter(col("rm").isNotNull)
    val loRank = math.max(1, math.ceil(0.05 * resamples).toInt)
    val hiRank = resamples + 1 - loRank
    // eager checkpoint of the R-row resample means: the lo and hi rank
    // probes were separate broadcast subqueries, and each (plus the
    // point-estimate leg's exchange reuse missing) re-ran the full
    // resamples× explode scan — the query paid the corpus pass up to
    // 3×. The checkpoint is R rows; both order statistics then come
    // from ONE window pass over it, fused into a single 2-column
    // aggregate instead of two filtered branches.
    val meansCk = Memo.managedCheckpoint(means)
    val bounds = meansCk
      .withColumn("rk", row_number().over(Window.orderBy(col("rm"), col("r"))))
      .filter(col("rk") === loRank || col("rk") === hiRank)
      .agg(min(when(col("rk") === loRank, col("rm"))).as("ci_lo_micro"),
        min(when(col("rk") === hiRank, col("rm"))).as("ci_hi_micro"))
      // zero-row parity with the old two-branch crossJoin: if either
      // central rank is missing (only possible on a near-empty input),
      // the old form produced no row at all — keep that contract
      .filter(col("ci_lo_micro").isNotNull && col("ci_hi_micro").isNotNull)
    point.crossJoin(broadcast(bounds))
      .select(col("n_orders"), lit(resamples).cast("long").as("n_resamples"),
        col("mean_micro"), col("ci_lo_micro"), col("ci_hi_micro"))
  }

  /** Kendall τ-b rank correlation between document quality score and
    * document length — "does my quality score just measure length?", the
    * standard sanity check before gating on either. Computed EXACTLY on
    * a domain-bounded contingency table: score quantized to 21 bins
    * (4-dp score ÷ 500) × length in log2 bins (≤ 64), so
    * concordant/discordant/tie masses are integer sums over ≤ 21×64
    * cells — never a per-document pair enumeration (O(n²)) or a global
    * rank sort. τ-b handles the heavy ties quantization creates.
    *
    * Scale: one map-side-combined rollup to the bounded cell table; the
    * cell×cell comparison is a broadcast nested-loop over ≤ 1344 rows
    * per side (whitelisted bounded-domain broadcast); everything else is
    * ungrouped 1-row aggregates. Sums ride decimal(38,0) so pair counts
    * (~n²/2) survive corpus sizes where they overflow a long.
    */
  def rankCorrQualityLength(documents: DataFrame): DataFrame = {
    val scored = TextOps.qualityScore(documents).select(
      expr("cast(round(quality_score * 10000) as bigint) div 500").as("x"),
      expr("cast(length(bin(greatest(n_chars, 1))) - 1 as bigint)").as("y"))
    val cells = scored.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    val c2 = cells.select(col("x").as("x2"), col("y").as("y2"),
      col("n").as("n2"))
    val prod = (col("n").cast("decimal(19,0)") * col("n2")).cast("decimal(38,0)")
    val conc = cells.join(broadcast(c2),
        col("x2") < col("x") && col("y2") < col("y"))
      .agg(coalesce(sum(prod), lit(0).cast("decimal(38,0)")).as("c"))
    val disc = cells.join(broadcast(c2),
        col("x2") < col("x") && col("y2") > col("y"))
      .agg(coalesce(sum(prod), lit(0).cast("decimal(38,0)")).as("d"))
    def tiePairs(key: String, alias: String) = cells
      .groupBy(col(key)).agg(sum(col("n")).as("t"))
      .agg(coalesce(sum((col("t").cast("decimal(19,0)") * (col("t") - 1))
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as(alias))
    val nxBins = cells.select(col("x")).distinct()
      .agg(count(lit(1)).as("n_x_bins"))
    val nyBins = cells.select(col("y")).distinct()
      .agg(count(lit(1)).as("n_y_bins"))
    val totals = cells.agg(sum(col("n")).as("nn"))
    // 2·n1, 2·n2, 2·n0 (keeping doubled values avoids the //2 until the
    // final double math, where the factors cancel inside the sqrt)
    totals
      .crossJoin(broadcast(conc)).crossJoin(broadcast(disc))
      .crossJoin(broadcast(tiePairs("x", "tx2")))
      .crossJoin(broadcast(tiePairs("y", "ty2")))
      .crossJoin(broadcast(nxBins)).crossJoin(broadcast(nyBins))
      .select(col("nn").as("n_docs"), col("n_x_bins"), col("n_y_bins"),
        expr("""round(
          case when cast(nn as decimal(19,0)) * (nn - 1) = tx2
                 or cast(nn as decimal(19,0)) * (nn - 1) = ty2 then null
               else cast(c - d as double) /
                 (sqrt(cast(cast(nn as decimal(19,0)) * (nn - 1) - tx2
                    as double) / 2.0)
                  * sqrt(cast(cast(nn as decimal(19,0)) * (nn - 1) - ty2
                    as double) / 2.0))
          end, 6)""").as("tau_b_r6"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test between the order-value
    * distributions of two date halves — the distribution-shift alarm a
    * pipeline runs when a source's character changes (the nonparametric
    * complement of [[graft.SparkEntry]]'s mean/stddev `stats_drift`).
    * D = sup_v |F_early(v) − F_late(v)| over values quantized to whole
    * dollars.
    *
    * Exactness: the sup is computed on cross-multiplied integer counts
    * |n_late·cum_early − n_early·cum_late| (DECIMAL(38,0) — the product
    * crosses 2⁶³ at lake scale), so no division happens until the final
    * d_micro = ⌊10⁶·D⌋ integer division — engine- and merge-order-stable.
    *
    * Scale: one fact-sized map-side-combined rollup to the DOLLAR grain
    * (the order-price domain is fixed by the schema, not by SF), one
    * cumulative window over that bounded distinct-dollar table, one
    * ungrouped-total broadcast. No corpus-grain window anywhere.
    */
  def ksOrderDrift(orders: DataFrame, cutoff: String = "1998-01-01"): DataFrame = {
    val byDollar = orders
      .select(floor(col("o_totalprice")).cast("long").as("v"),
        (col("o_orderdate") < lit(cutoff)).as("early"))
      .groupBy(col("v"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("a"),
        sum(when(col("early"), 0L).otherwise(1L)).as("b"))
    ksFromCounts(byDollar)
      .select(col("n_a").as("n_early"), col("n_b").as("n_late"),
        col("ks_at_v").as("ks_at_usd"), col("d_micro"))
  }

  /** KS core over a pre-rolled-up (v, a, b) count grid: the sup of
    * |n_b·cum_a − n_a·cum_b| (exact DECIMAL(38,0) cross-multiplied
    * integers) with d_micro = ⌊10⁶·D/(n_a·n_b)⌋ and the smallest value
    * achieving it. Shared by [[ksOrderDrift]] (date-half split of one
    * table) and the streaming drift monitor
    * [[graft.streaming.EventStreams.ksDriftStream]] (pinned baseline vs
    * micro-batch). Callers quantize `v` to a schema-bounded domain so
    * the cumulative window rides a bounded distinct-value grid.
    */
  private[graft] def ksFromCounts(byV: DataFrame): DataFrame = {
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = byV.agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"))
    byV
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("diff",
        abs(col("n_b").cast("decimal(19,0)") * col("ca") -
          col("n_a").cast("decimal(19,0)") * col("cb")).cast("decimal(38,0)"))
      .withColumn("dmax", max(col("diff")).over(Window.partitionBy(lit(1))))
      .filter(col("diff") === col("dmax"))
      .groupBy(col("n_a"), col("n_b"), col("dmax"))
      .agg(min(col("v")).as("ks_at_v"))
      // integral div (not decimal /): both engines truncate, and the
      // operands are positive exact integers, so floor == trunc == div.
      // A one-sided input (either sample empty) has no drift to measure
      // and would divide by zero (an ERROR under ANSI) — report D = 0.
      .select(col("n_a"), col("n_b"), col("ks_at_v"),
        expr("""cast(case when n_a = 0 or n_b = 0 then 0
          else (dmax * 1000000) div
            (cast(n_a as decimal(19,0)) * n_b) end as bigint)""")
          .as("d_micro"))
  }

  /** Contingency mix-shift audit: observed vs expected cell counts for
    * order priority × date half (the χ² input table, kept in exact
    * integers instead of collapsing to one statistic — the per-cell
    * deviations are what tell an operator WHICH priority drifted).
    * expected·1000 = ⌊1000·row_total·col_total / n⌋ (integer division of
    * exact integers); dev_milli = 1000·obs − exp_milli. Output is
    * |priorities|×2 rows — bounded by the enum domain at any SF.
    *
    * Scale: one fact rollup to the 10-cell grid; the margins are windows
    * over that bounded grid, never over rows.
    */
  def priorityMixShift(orders: DataFrame, cutoff: String = "1998-01-01"): DataFrame = {
    val cells = orders
      .select(col("o_orderpriority").as("priority"),
        when(col("o_orderdate") < lit(cutoff), "early").otherwise("late").as("half"))
      .groupBy(col("priority"), col("half"))
      .agg(count(lit(1)).as("obs"))
    val wRow = Window.partitionBy(col("priority"))
    val wCol = Window.partitionBy(col("half"))
    val wAll = Window.partitionBy(lit(1))
    cells
      .withColumn("rt", sum(col("obs")).over(wRow))
      .withColumn("ct", sum(col("obs")).over(wCol))
      .withColumn("n", sum(col("obs")).over(wAll))
      .select(col("priority"), col("half"), col("obs"),
        expr("""cast((cast(rt as decimal(19,0)) * ct * 1000) div
          cast(n as decimal(38,0)) as bigint)""").as("exp_milli"))
      .withColumn("dev_milli", col("obs") * 1000 - col("exp_milli"))
  }

  /** Exact Mann–Whitney U (Wilcoxon rank-sum) between discounted and
    * full-price line items on extended price — the nonparametric "are
    * the two price distributions shifted" test a median-diff eyeball
    * can't defend. Ties take MIDRANKS; everything is doubled so the
    * midrank `2·(cum−c)+c+1` stays integral: `u2_*` is 2·U and
    * `auc_micro` = U_a/(n_a·n_b) in micro-units — the probability a
    * random discounted line out-prices a random full-price one (the
    * rank-sum effect size). DECIMAL(38,0) internals (rank sums cross
    * 2⁶³ at lake row counts); outputs project to LONG under ANSI, so a
    * pathological overflow errors loudly, never wraps.
    *
    * Scale: one fact rollup to the distinct-cents grain (bounded by the
    * price DOMAIN), the cumulative via [[OpUtils.twoLevelCum]]'s bounded
    * window levels, then a scalar fold — no row-level sort anywhere.
    */
  def mannWhitneyU(lineitem: DataFrame): DataFrame = {
    val v = lineitem.select(
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"),
      when(col("l_discount") > 0, 1L).otherwise(0L).as("grp"))
    val byV = v.groupBy(col("cents")).agg(
      sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("ca"),
      sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val folded = OpUtils.twoLevelCum(byV, "cents", "c")
      // doubled rank-sum of group A over the tie group at value v:
      // ranks span (cum−c, cum], their doubled midrank is 2(cum−c)+c+1
      .agg(
        coalesce(sum(col("ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("cb")), lit(0L)).as("n_b"),
        coalesce(sum(col("ca").cast("decimal(38,0)") *
          (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L))),
          lit(0).cast("decimal(38,0)")).as("r2a"))
    folded
      // empty input → no verdict row (matching the oracle's WHERE guard)
      .filter(col("n_a") + col("n_b") > 0)
      .withColumn("u2_a", expr(
        "cast(r2a - cast(n_a as decimal(38,0)) * (n_a + 1) as decimal(38,0))"))
      .select(col("n_a"), col("n_b"),
        col("u2_a").cast("long").as("u2_a"),
        expr("""cast(cast(n_a as decimal(38,0)) * n_b * 2 - u2_a
          as bigint)""").as("u2_b"),
        expr("""cast(case when n_a = 0 or n_b = 0 then null
          else (u2_a * 1000000) div (cast(n_a as decimal(38,0)) * n_b * 2)
          end as bigint)""").as("auc_micro"))
  }

  /** Exact Kendall rank correlation between daily revenue and daily
    * order count — "do busier days make proportionally more money, and
    * how consistently": concordant/discordant/tied pair censuses over
    * the calendar-bounded daily table plus τ_a in micro-units
    * (sign-branched integer division, so both engines floor toward
    * zero identically).
    *
    * Scale: rides the Memo-shared [[OpUtils.dayPairs]] table (built
    * once per session for the whole pairwise-daily family) — SF-
    * independent by construction, the theil_sen shape; the fact table
    * is touched once per session by [[OpUtils.dailyFact]].
    */
  def kendallTauDaily(orders: DataFrame): DataFrame = {
    // sign COMPARISONS, never the cross product of the two deltas —
    // day-grain cents deltas times count deltas would overflow a long
    // at lake-scale daily volumes
    val pairs = OpUtils.dayPairs(orders).filter(col("tb") > col("ta"))
      .select(
        when((col("yb") > col("ya") && col("mb") > col("ma")) ||
          (col("yb") < col("ya") && col("mb") < col("ma")), 1L)
          .otherwise(0L).as("conc"),
        when((col("yb") > col("ya") && col("mb") < col("ma")) ||
          (col("yb") < col("ya") && col("mb") > col("ma")), 1L)
          .otherwise(0L).as("disc"),
        when(col("yb") === col("ya") && col("mb") =!= col("ma"), 1L)
          .otherwise(0L).as("tie_y"),
        when(col("mb") === col("ma") && col("yb") =!= col("ya"), 1L)
          .otherwise(0L).as("tie_m"),
        when(col("yb") === col("ya") && col("mb") === col("ma"), 1L)
          .otherwise(0L).as("tie_both"))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      coalesce(sum(col("conc")), lit(0L)).as("n_concordant"),
      coalesce(sum(col("disc")), lit(0L)).as("n_discordant"),
      coalesce(sum(col("tie_y")), lit(0L)).as("n_ties_revenue"),
      coalesce(sum(col("tie_m")), lit(0L)).as("n_ties_count"),
      coalesce(sum(col("tie_both")), lit(0L)).as("n_ties_both"))
      .filter(col("n_pairs") > 0)
      .withColumn("tau_a_micro", expr(
        """case when n_concordant >= n_discordant
          |then ((n_concordant - n_discordant) * 1000000) div n_pairs
          |else -(((n_discordant - n_concordant) * 1000000) div n_pairs)
          |end""".stripMargin))
  }

  /** Hodges–Lehmann robust location of daily revenue — the median of
    * all Walsh averages (yᵢ+yⱼ)/2 over day pairs i ≤ j: the location
    * estimator with the same 29%-breakdown robustness story as
    * [[theilSenTrend]]'s slope (one flash-sale day barely moves it,
    * unlike the mean) and better efficiency than the plain median.
    * Everything stays integral by carrying 2·average = yᵢ+yⱼ cents; the
    * median is the two central order statistics (equal when the pair
    * count is odd), with the display dollars rounded from the same
    * exact integers in both engines.
    *
    * Scale: the O(days²) Walsh-pair join runs on the Memo-shared
    * calendar-bounded daily table (≤ ~2.5k rows → ≤ ~3M pairs at ANY
    * SF) broadcast on one side; the median bracket is the kind=0 row
    * of the Memo-shared [[OpUtils.pairMedians]] — the theil_sen shape
    * end to end, sharing its memoized daily rollup so the fact table
    * is still touched once per session.
    */
  def hodgesLehmannDaily(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
    // kind 0 = the Walsh-sum median bracket of the Memo-shared
    // [[OpUtils.pairMedians]] (tb ≥ ta — the Walsh diagonal included),
    // built in the same pass as the Theil–Sen slope median; zero pairs
    // emit no row, so the crossJoin yields zero rows like the oracle
    val med = OpUtils.pairMedians(orders).filter(col("kind") === 0L)
    daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(med)) // 1-row × ≤1-row scalar plumbing
      // display column stays EXACT: HL = (lo+hi)/4 cents, reported as
      // truncating integer milli-dollars — a rounded double here hit a
      // real .5-at-2dp boundary (…, .035) where the engines' double
      // rounding disagreed
      .select(col("n_days"), col("m").as("n_pairs"),
        col("lo").as("hl2_lo_cents"), col("hi").as("hl2_hi_cents"),
        expr("((lo + hi) * 10) div 4").as("hl_milli_dollars"))
  }

  /** Exact Spearman rank correlation between daily revenue and daily
    * order count — the monotone-association complement of
    * [[kendallTauDaily]] (same question, different estimator; Spearman
    * weighs rank DISTANCE where Kendall counts inversions). Ties take
    * MIDRANKS via the distinct-value CDF; everything is doubled so
    * midranks stay integral (2·midrank = 2·(cum − c) + c + 1, the
    * Mann–Whitney convention), and ρ is Pearson over the doubled
    * midranks from EXACT DECIMAL(38,0) sums — the doubling cancels, and
    * only the final IEEE division/sqrt runs in double, identically in
    * both engines. Zero-variance legs (a constant series) yield NULL,
    * never NaN (the engine-parity rule).
    *
    * Scale: rides the Memo-shared [[OpUtils.dailyFact]] rollup; ranks
    * come from two [[OpUtils.twoLevelCum]] passes over the
    * calendar-bounded distinct-value tables — the fact is touched once
    * per session, no corpus-grain sort anywhere.
    */
  def spearmanDaily(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders).select(col("t"), col("y"), col("m"))
    def midranks(valueCol: String): DataFrame = {
      val byV = daily.groupBy(col(valueCol)).agg(count(lit(1)).as("c"))
      OpUtils.twoLevelCum(byV, valueCol, "c")
        .select(col(valueCol),
          (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L))
            .as(s"r2_$valueCol"))
    }
    val ranked = daily
      .join(midranks("y"), Seq("y"))
      .join(midranks("m"), Seq("m"))
      .select(col("r2_y").as("x"), col("r2_m").as("z"))
    ranked.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("z").cast("decimal(38,0)")).as("sz"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
      sum(col("z").cast("decimal(38,0)") * col("z")).as("szz"),
      sum(col("x").cast("decimal(38,0)") * col("z")).as("sxz"))
      .filter(col("n") > 0)
      .select(col("n").cast("long").as("n_days"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("vx"),
        (col("n") * col("szz") - col("sz") * col("sz")).cast("double").as("vz"),
        (col("n") * col("sxz") - col("sx") * col("sz")).cast("double").as("cov"))
      .select(col("n_days"),
        when(col("vx") > 0 && col("vz") > 0,
          round(col("cov") / sqrt(col("vx") * col("vz")), 6)).as("rho_r6"))
  }

  /** Cramér's V association between order priority and order status —
    * "does priority drive fulfillment status, and how strongly": the
    * normalized-χ² effect size over the bounded enum×enum contingency
    * grid (the single-number summary of [[priorityMixShift]]'s per-cell
    * deviations). Exactness: φ² = χ²/n = Σ obs²/(r_t·c_t) − 1 is
    * computed as per-cell truncated micro contributions
    * ⌊10⁶·obs²/(r_t·c_t)⌋ summed over the ≤ |priorities|×|statuses|
    * grid — a DETERMINISTIC definition both engines replay exactly
    * (obs²·10⁶ stays inside DECIMAL(38,0) at any SF, unlike the naive
    * (obs·n − r·c)² form whose square crosses 10³⁸ at lake row counts).
    * V = √(φ²/min(r−1, c−1)) is one IEEE sqrt from the exact integer.
    *
    * Scale: one fact-sized map-side-combined rollup to the enum grid;
    * margins are windows over that bounded grid, never over rows.
    */
  def priorityStatusCramersV(orders: DataFrame): DataFrame = {
    val cells = orders
      .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("s"))
      .agg(count(lit(1)).as("obs"))
    val wRow = Window.partitionBy(col("p"))
    val wCol = Window.partitionBy(col("s"))
    val wAll = Window.partitionBy(lit(1))
    cells
      .withColumn("rt", sum(col("obs")).over(wRow))
      .withColumn("ct", sum(col("obs")).over(wCol))
      .withColumn("n", sum(col("obs")).over(wAll))
      .withColumn("nr", size(collect_set(col("p")).over(wAll)).cast("long"))
      .withColumn("nc", size(collect_set(col("s")).over(wAll)).cast("long"))
      .withColumn("contrib_micro", expr(
        """(cast(obs as decimal(38,0)) * obs * 1000000)
          | div (cast(rt as decimal(19,0)) * ct)""".stripMargin))
      .groupBy(col("n"), col("nr").as("n_priorities"), col("nc").as("n_statuses"))
      .agg((sum(col("contrib_micro")) - lit(1000000L)).cast("long")
        .as("phi2_micro"))
      .filter(col("n") > 0)
      .select(col("n").as("n_orders"), col("n_priorities"), col("n_statuses"),
        col("phi2_micro"),
        when(least(col("n_priorities"), col("n_statuses")) > 1,
          round(sqrt(greatest(col("phi2_micro").cast("double"), lit(0.0)) /
            lit(1e6) /
            (least(col("n_priorities"), col("n_statuses")) - 1).cast("double")),
            6)).as("cramers_v_r6"))
  }

  /** Wald–Wolfowitz runs test on daily revenue vs its median — "is the
    * revenue series random around its level, or does it streak":
    * above/at-or-below signs from the exact lower-median order
    * statistic, the observed run count, and the exact expected run
    * count 1 + 2·n₁·n₂/n in milli-units. Too FEW runs = persistent
    * regimes (the streaks [[graft.operators.TrendOps]] models); too
    * many = oscillation (e.g. alternating batch effects).
    *
    * Scale: everything after the one fact rollup lives on the
    * calendar-bounded daily table (≤ ~2.5k rows at ANY SF) — the
    * ordered-window pass over it is domain-bounded, the daily-ops
    * contract.
    */
  def runsTestDaily(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders).select(col("d"), col("y"))
    val byV = daily.groupBy(col("y")).agg(count(lit(1)).as("c"))
    val tot = byV.agg(sum(col("c")).as("n"))
    // lower median: smallest y with 2·cum ≥ n (percentile_disc 0.5)
    val med = OpUtils.twoLevelCum(byV, "y", "c")
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("n"))
      .agg(min(col("y")).as("med"))
    val signs = daily.crossJoin(broadcast(med))
      .select(col("d"), when(col("y") > col("med"), 1L).otherwise(0L).as("s"))
    val flips = signs
      .withColumn("prev", lag(col("s"), 1).over(Window.orderBy(col("d"))))
      .select(
        when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L).as("new_run"),
        col("s"))
    flips.agg(
      count(lit(1)).as("n_days"),
      coalesce(sum(col("s")), lit(0L)).as("n_above"),
      (count(lit(1)) - coalesce(sum(col("s")), lit(0L))).as("n_below"),
      coalesce(sum(col("new_run")), lit(0L)).as("n_runs"))
      .filter(col("n_days") > 0)
      .withColumn("expected_runs_milli",
        expr("1000 + (2000 * n_above * n_below) div n_days"))
  }

  /** Brown–Forsythe test of dispersion homogeneity across order
    * priorities — "do the priority classes differ in order-value
    * SPREAD, not just location": the robust Levene variant whose
    * centers are per-group MEDIANS (Brown & Forsythe 1974), so one
    * heavy-tailed class cannot fake a variance difference. W =
    * ((N−k)/(k−1)) · Σ n_g(z̄_g−z̄)² / Σ_g Σ(z−z̄_g)² over the absolute
    * deviations z = |usd − median_g|.
    *
    * Exactness: z is INTEGER dollars around the exact lower median; the
    * per-group moments (n, Σz, Σz²) are exact decimals; the group means
    * are truncated to micro-dollars (⌊Σz·10⁶/n⌋ — a deterministic
    * definition both engines replay, the Cramér's-V contribution
    * pattern), so between/within sums are exact integers whose products
    * stay inside DECIMAL(38,0) at lake counts (n_g·(Δmicro)² ≤ 10¹¹ ·
    * (6·10¹¹)² ≈ 10³⁵); the final W is one double expression over those
    * integers, identical association order in both engines.
    *
    * Scale: the fact contributes exactly one pass (the Memo-shared
    * [[OpUtils.priorityUsdCdf]] dollar-grain rollup, also feeding
    * robust_price_stats); the deviation re-grain and moment aggs run on
    * the DOMAIN-bounded CDF, and the cross-group windows see ≤
    * |priorities| rows.
    */
  def levenePriorityDispersion(orders: DataFrame): DataFrame = {
    val cdf = OpUtils.priorityUsdCdf(orders)
    val med = cdf.groupBy(col("grp")).agg(
      min(when(col("cum") * 2 >= col("total"), col("usd"))).as("med"))
    val g = cdf.join(broadcast(med), Seq("grp"))
      .select(col("grp"), col("med"),
        abs(col("usd") - col("med")).as("z"), col("n"))
      .groupBy(col("grp"))
      .agg(max(col("med")).as("median_usd"),
        sum(col("n")).as("ng"),
        sum(col("z").cast("decimal(38,0)") * col("n")).as("sg"),
        sum(col("z").cast("decimal(38,0)") * col("z") * col("n")).as("qg"))
    val wAll = Window.partitionBy(lit(1)) // ≤ |priorities| rows
    g.withColumn("nt", sum(col("ng")).over(wAll))
      .withColumn("st", sum(col("sg")).over(wAll))
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("m_micro", expr("(sg * 1000000) div ng"))
      .withColumn("msq_micro", expr("(qg * 1000000) div ng"))
      .withColumn("var_micro", expr(
        "msq_micro - (cast(m_micro as decimal(38,0)) * m_micro) div 1000000"))
      .withColumn("gm_micro", expr("(st * 1000000) div nt"))
      .withColumn("a_g", expr(
        """cast(ng as decimal(38,0)) * (m_micro - gm_micro)
          | * (m_micro - gm_micro)""".stripMargin))
      .withColumn("b_g", expr("cast(ng as decimal(38,0)) * var_micro"))
      .withColumn("a_tot", sum(col("a_g")).over(wAll))
      .withColumn("b_tot", sum(col("b_g")).over(wAll))
      .select(col("grp").as("o_orderpriority"),
        col("ng").cast("long").as("n_orders"),
        col("median_usd"),
        col("m_micro").cast("long").as("mean_absdev_micro"),
        when(col("k") > 1 && col("b_tot") > 0,
          round((col("nt") - col("k")).cast("double") *
            col("a_tot").cast("double") /
            ((col("k") - lit(1L)).cast("double") *
              col("b_tot").cast("double") * lit(1e6)), 6)).as("bf_w_r6"))
  }

  /** Welch's unequal-variance t-test between WEEKEND and WEEKDAY daily
    * revenue — "is the weekend level genuinely different, given both
    * groups' own noise": the two-sample location test that does not
    * assume equal variances (the correct default; Student's t is the
    * special case). Exactness: per-group sufficient statistics (n, Σy,
    * Σy²) are exact DECIMAL(38,0) over the Memo-shared daily fact,
    * pivoted to ONE row so the final t/df computation is a single FIXED
    * double expression tree (identical association order in both
    * engines — the ccf/ACF contract); v₁/v₀ are materialized once as
    * double columns and reused, so t and df read the same values.
    *
    * Scale: the fact contributes one Memo-shared rollup; everything
    * after is a 2-row grouped agg and a 1-row projection.
    */
  def welchWeekendRevenue(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
      .select(when(weekday(col("d")) + 1 >= 6, 1).otherwise(0).as("we"),
        col("y"))
    val g = daily.groupBy(col("we"))
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("decimal(38,0)").as("s"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("q"))
    g.agg(
      coalesce(sum(when(col("we") === 1, col("n"))), lit(0L)).as("n1"),
      sum(when(col("we") === 1, col("s"))).as("s1"),
      sum(when(col("we") === 1, col("q"))).as("q1"),
      coalesce(sum(when(col("we") === 0, col("n"))), lit(0L)).as("n0"),
      sum(when(col("we") === 0, col("s"))).as("s0"),
      sum(when(col("we") === 0, col("q"))).as("q0"))
      .filter(col("n1") + col("n0") > 0)
      .withColumn("a1", expr("n1 * q1 - s1 * s1"))
      .withColumn("a0", expr("n0 * q0 - s0 * s0"))
      .withColumn("v1", expr("""cast(a1 as double) / (cast(n1 as double)
        | * cast(n1 as double) * cast(n1 - 1 as double))""".stripMargin))
      .withColumn("v0", expr("""cast(a0 as double) / (cast(n0 as double)
        | * cast(n0 as double) * cast(n0 - 1 as double))""".stripMargin))
      .select(col("n1").as("n_weekend"), col("n0").as("n_weekday"),
        // exact truncated-micro means, not a rounded double — a cents
        // mean can land exactly on a representable .5 boundary (the
        // hodges_lehmann lesson)
        when(col("n1") > 0 && col("n0") > 0, expr(
          "(s1 * 1000000) div n1 - (s0 * 1000000) div n0").cast("long"))
          .as("mean_diff_microcents"),
        when(col("n1") > 1 && col("n0") > 1 && expr("v1 + v0 > 0"), expr(
          """round((cast(s1 as double) / cast(n1 as double)
            | - cast(s0 as double) / cast(n0 as double))
            | / sqrt(v1 + v0), 4)""".stripMargin)).as("welch_t_r4"),
        when(col("n1") > 1 && col("n0") > 1 &&
            expr("v1 > 0 or v0 > 0"), expr(
          """round((v1 + v0) * (v1 + v0)
            | / (v1 * v1 / cast(n1 - 1 as double)
            |    + v0 * v0 / cast(n0 - 1 as double)), 2)""".stripMargin))
          .as("welch_df_r2"))
  }

  /** Kruskal–Wallis rank test of daily revenue across the 7 weekdays —
    * the nonparametric one-way ANOVA: does ANY weekday's revenue
    * distribution sit apart, without assuming normality (the k-group
    * extension of Mann–Whitney, on the same midrank machinery). H =
    * 3/(N(N+1))·Σ R2²_g/n_g − 3(N+1) over DOUBLED midranks (keeps rank
    * sums integral), with the standard tie correction 1 − Σ(t³−t)/
    * (N³−N). Exactness: doubled midranks via the shared two-level CDF,
    * per-group rank sums exact DECIMAL(38,0), pivoted to ONE row so H
    * is a single fixed double expression (7 terms in weekday order);
    * the all-tied degenerate (correction 0) yields NULL.
    *
    * Scale: one Memo-shared daily rollup; ranks ride bounded two-level
    * windows over the distinct-revenue grain; the pivot sees ≤7 rows.
    */
  def kruskalWeekdayRevenue(orders: DataFrame): DataFrame = {
    val daily = OpUtils.dailyFact(orders)
      .select((weekday(col("d")) + 1).cast("long").as("dow"), col("y"))
    val byV = daily.groupBy(col("y")).agg(count(lit(1)).as("c"))
    val r2 = OpUtils.twoLevelCum(byV, "y", "c")
      .select(col("y"),
        (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L)).as("r2"))
    val g = daily.join(r2, Seq("y"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("r2").cast("decimal(38,0)")).as("sr"))
    val ties = byV.agg(coalesce(
      sum(col("c").cast("decimal(38,0)") * col("c") * col("c") - col("c")),
      lit(0).cast("decimal(38,0)")).as("tsum"))
    val pivotCols = (1 to 7).flatMap(i => Seq(
      coalesce(sum(when(col("dow") === i, col("n"))), lit(0L)).as(s"n$i"),
      coalesce(sum(when(col("dow") === i, col("sr"))),
        lit(0).cast("decimal(38,0)")).as(s"r$i")))
    val terms = (1 to 7).map(i =>
      s"case when n$i > 0 then cast(r$i as double) * cast(r$i as double)" +
        s" / cast(n$i as double) else 0.0d end").mkString(" + ")
    g.agg(pivotCols.head, pivotCols.tail: _*)
      .withColumn("n", expr("n1 + n2 + n3 + n4 + n5 + n6 + n7"))
      .filter(col("n") >= 2)
      .crossJoin(broadcast(ties))
      .withColumn("h", expr(
        s"""3.0d * ($terms) / (cast(n as double) * cast(n + 1 as double))
           | - 3.0d * cast(n + 1 as double)""".stripMargin))
      .withColumn("corr", expr(
        """1.0d - cast(tsum as double)
          | / (cast(n as double) * cast(n as double) * cast(n as double)
          |    - cast(n as double))""".stripMargin))
      .select(col("n").as("n_days"), round(col("h"), 6).as("h_r6"),
        when(col("corr") > 0, round(expr("h / corr"), 6))
          .as("h_tie_corr_r6"))
  }

  /** Leave-one-NATION-out jackknife of the global mean order value —
    * "how much does any single market drive the headline number": the
    * delete-a-group jackknife (one replicate per nation, each the mean
    * with that nation's orders removed) with the classic SE estimate
    * √((G−1)/G · Σ(θ̂₍g₎ − θ̄)²). A replicate far from the grand mean
    * names the nation whose removal moves the metric most — the
    * sensitivity audit next to [[bootstrapCiOrderValue]]'s resampling
    * CI.
    *
    * Exactness: per-nation (n, Σcents) are exact; each replicate mean
    * is truncated to micro-cents (⌊(S−S_g)·10⁶/(N−n_g)⌋), the replicate
    * average to micro-cents again, and the squared deviations are exact
    * DECIMAL(38,0) products; the final SE is one double sqrt/division
    * over those integers.
    *
    * Scale: one fact-sized grouped agg to the nation grain (broadcast
    * dim joins); everything after lives on ≤ |nations| rows.
    */
  def jackknifeNationRevenue(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val byNation = orders
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("ng"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("decimal(38,0)").as("sg"))
    val wAll = Window.partitionBy(lit(1)) // ≤ |nations| rows
    byNation
      .withColumn("nt", sum(col("ng")).over(wAll))
      .withColumn("st", sum(col("sg")).over(wAll))
      .filter(col("nt") > col("ng")) // degenerate single-populated-nation
      .withColumn("gcnt", count(lit(1)).over(wAll)) // = replicate count
      .withColumn("loo_micro", expr("((st - sg) * 1000000) div (nt - ng)"))
      .withColumn("rep_mean_micro",
        expr("(sum(loo_micro) over (partition by 1)) div gcnt"))
      .withColumn("dev2", expr(
        """cast(loo_micro - rep_mean_micro as decimal(38,0))
          | * (loo_micro - rep_mean_micro)""".stripMargin))
      .withColumn("sdev2", sum(col("dev2")).over(wAll))
      .select(col("nation"), col("ng").cast("long").as("n_orders"),
        col("loo_micro").cast("long").as("loo_mean_microcents"),
        when(col("gcnt") > 1,
          round(sqrt((col("gcnt") - lit(1L)).cast("double") *
            col("sdev2").cast("double") / col("gcnt").cast("double")) /
            lit(1e6), 6)).as("jk_se_cents_r6"))
  }
}
