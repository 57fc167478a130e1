package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Right-censored time-to-event (survival) analysis of the signup →
  * first-purchase conversion — the censoring-aware complement of
  * AsOfOps' conversion-latency quartiles, which can only describe the
  * users who DID convert. A fixed observation window (study cutoff =
  * first event timestamp + horizonDays, in whole epoch seconds — the
  * conversion_latency floor-seconds idiom) right-censors users whose
  * first purchase falls after the cutoff or never happens: dropping
  * them would bias conversion speed optimistic, counting them as
  * conversions would bias it pessimistic. Kaplan–Meier and Nelson–Aalen
  * are THE standard estimators for exactly this censoring structure.
  *
  * Exactness: event algebra is integer epoch seconds and integer
  * duration hours; the estimates are truncated integer units
  * (nano-hazard terms, survival ·10¹² with per-step floor) —
  * deterministic DEFINITIONS both engines replay bit-for-bit (the
  * oracle's recursive CTE folds the same integer recurrence), no float
  * accumulation anywhere.
  *
  * Scale: the fact-sized work is two map-side-combined per-user rollups
  * (first signup, first qualifying purchase — both shuffle once on
  * user_id); everything downstream lives on the duration-hour grid,
  * bounded BY CONSTRUCTION to horizonDays·24+1 rows (every duration,
  * event or censored, is capped by the observation window), so the
  * unpartitioned prefix windows and the Kaplan–Meier fold are dim-sized
  * at any SF.
  */
object SurvivalOps {

  /** Default A/B arm assignment: parity of the oracle-parity md5 hash
    * of "ab:<user_id>" — the dataset_split idiom, a deterministic
    * 50/50 experiment split both engines replay.
    */
  private def defaultArm = pmod(graft.functions.HashFns.hash32(
    concat(lit("ab:"), col("user_id").cast("string"))), lit(2)).cast("long")

  /** The per-ARM duration-hour grid: one row per (h, arm) with event
    * count d (first purchase at hour h after signup) and total observed
    * count w (events + censorings at h). Memo-shared: the single-grid
    * consumers ([[conversionGrid]]) and the two-sample log-rank both
    * project from THIS derivation, so the fact-sized per-user rollups
    * behind the whole survival family run once per session.
    */
  private[operators] def conversionArmGrid(events: DataFrame,
      horizonDays: Int): DataFrame =
    Memo.cached(s"conversion_arm_grid:$horizonDays", events) { ev =>
      val cut = ev.agg((min(unix_timestamp(col("ts"))) +
        lit(horizonDays.toLong * 86400L)).as("cut_s"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(unix_timestamp(col("ts"))).as("s_s"))
        .crossJoin(broadcast(cut))
        .filter(col("s_s") <= col("cut_s"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_timestamp(col("ts")).as("p_s"))
      // left join keeps never-purchasing users; the conditional min
      // keeps users whose purchases all precede signup or postdate the
      // cutoff (both censored), which a join filter would drop
      val durs = signups.join(purchases, Seq("user_id"), "left")
        .groupBy(col("user_id"))
        .agg(first(col("s_s")).as("s_s"), first(col("cut_s")).as("cut_s"),
          min(when(col("p_s") >= col("s_s") && col("p_s") <= col("cut_s"),
            col("p_s"))).as("p_s"))
        .select(defaultArm.as("arm"),
          when(col("p_s").isNotNull, lit(1L)).otherwise(lit(0L)).as("ev"),
          expr("(coalesce(p_s, cut_s) - s_s) div 3600").as("h"))
      durs.groupBy(col("h"), col("arm"))
        .agg(sum(col("ev")).as("d"), count(lit(1)).as("w"))
    }

  /** The pooled duration-hour grid with at-risk counts — a grouped
    * projection of the Memo-shared [[conversionArmGrid]] (≤ 2·(24·
    * horizonDays+1) rows), never a second fact pass.
    */
  private[operators] def conversionGrid(events: DataFrame,
      horizonDays: Int): DataFrame = {
    val byH = conversionArmGrid(events, horizonDays)
      .groupBy(col("h"))
      .agg(sum(col("d")).as("d"), sum(col("w")).as("w"))
    // grid ≤ horizonDays·24+1 rows by construction: both unpartitioned
    // windows sit above a bounded grouped aggregate, which is what the
    // plan-audit sweep's aggregate-below-window rule accepts
    byH
      .withColumn("n_total", sum(col("w")).over(Window.partitionBy(lit(1))))
      .withColumn("cum_prev", coalesce(sum(col("w")).over(
        Window.orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("h"), col("d"), (col("w") - col("d")).as("c"),
        (col("n_total") - col("cum_prev")).as("n_risk"))
  }

  /** Two-sample LOG-RANK test between the hash-split A/B arms of the
    * censored conversion curve — "did arm B convert at a different RATE
    * over the whole observation window", the standard readout of a
    * time-to-event experiment (comparing raw conversion shares throws
    * away censoring and timing; the log-rank compares the full hazard
    * trajectories). At each event hour the observed arm-B events d_B
    * are set against the hypergeometric expectation d·n_B/n and
    * variance d·(n_B/n)·(n_A/n)·(n−d)/(n−1); Z = (O_B − E_B)/√V. On
    * the null 50/50 hash split Z ≈ 0 is the expected CALIBRATION
    * readout — the operator exists so a real treatment column can be
    * swapped in.
    *
    * Exactness: every per-hour term is truncated integer micro-units
    * (the Cramér's-V contribution pattern — expectation ⌊10⁶·d·n_B/n⌋,
    * variance via stepwise micro fractions, all inside DECIMAL(38,0)
    * at any SF), summed exactly over the bounded grid; Z is one double
    * expression over three exact integers.
    *
    * Scale: rides the Memo-shared [[conversionArmGrid]]; everything
    * here is arithmetic on ≤ 2·(24·horizonDays+1) rows.
    */
  def logrankConversionAb(events: DataFrame,
      horizonDays: Int = 14): DataFrame = {
    val byH = conversionArmGrid(events, horizonDays)
      .groupBy(col("h"))
      .agg(sum(when(col("arm") === 1, col("d"))).as("d1"),
        sum(when(col("arm") === 1, col("w"))).as("w1"),
        sum(when(col("arm") === 0, col("d"))).as("d0"),
        sum(when(col("arm") === 0, col("w"))).as("w0"))
      .na.fill(0L, Seq("d1", "w1", "d0", "w0"))
    val risk = byH
      .withColumn("nt1", sum(col("w1")).over(Window.partitionBy(lit(1))))
      .withColumn("nt0", sum(col("w0")).over(Window.partitionBy(lit(1))))
      .withColumn("cp1", coalesce(sum(col("w1")).over(
        Window.orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cp0", coalesce(sum(col("w0")).over(
        Window.orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n1", col("nt1") - col("cp1"))
      .withColumn("n0", col("nt0") - col("cp0"))
      .withColumn("dt", col("d1") + col("d0"))
      .withColumn("n", col("n1") + col("n0"))
      .filter(col("dt") > 0)
      .withColumn("e1", expr(
        "(cast(dt as decimal(38,0)) * n1 * 1000000) div n"))
      // fa/fb/fc enter the ×10⁶ multiply as decimal(38,0), matching the
      // e1/v terms — a long multiply here wraps past ~9.2e12 at-risk
      // users and silently diverges from the oracle's HUGEINT
      .withColumn("fa", expr(
        "(cast(n1 as decimal(38,0)) * 1000000) div n"))
      .withColumn("fb", expr(
        "(cast(n0 as decimal(38,0)) * 1000000) div n"))
      .withColumn("fc", expr(
        """case when n > 1
          | then (cast(n - dt as decimal(38,0)) * 1000000) div (n - 1)
          | else 0 end""".stripMargin))
      .withColumn("v", expr(
        // the div-results re-enter as decimal: a long×long product here
        // (d·10⁶ × 10⁶) crosses 2⁶³ at lake event counts
        """(cast((cast(dt as decimal(38,0)) * fa * fb) div 1000000
          |   as decimal(38,0)) * fc) div 1000000""".stripMargin))
    risk.agg(
      max(col("nt0")).as("n_users_a"), max(col("nt1")).as("n_users_b"),
      coalesce(sum(col("d0")), lit(0L)).as("conv_a"),
      coalesce(sum(col("d1")), lit(0L)).as("conv_b"),
      coalesce(sum(col("e1").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("e1_micro"),
      coalesce(sum(col("v").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("v_micro"))
      .filter(col("n_users_a").isNotNull)
      .select(col("n_users_a"), col("n_users_b"), col("conv_a"),
        col("conv_b"),
        col("e1_micro").cast("long").as("expected_b_micro"),
        col("v_micro").cast("long").as("variance_micro"),
        when(col("v_micro") > 0, expr(
          """round((cast(conv_b as double) * 1000000.0d
            | - cast(e1_micro as double))
            | / sqrt(cast(v_micro as double) * 1000000.0d), 4)"""
            .stripMargin)).as("logrank_z_r4"))
  }

  /** Nelson–Aalen cumulative hazard of conversion: H(t) = Σ_{h≤t} d_h /
    * n_h over event hours, each term truncated to integer nano-units
    * (⌊10⁹·d/n_risk⌋ — d·10⁹ stays inside int64 at any SF since d is a
    * user count), the cumulative sum an exact integer prefix over the
    * bounded grid. Rows are emitted at event hours only (zero-event
    * hours contribute zero hazard but would pad the output).
    */
  def nelsonAalenConversion(events: DataFrame,
      horizonDays: Int = 14): DataFrame = {
    val grid = conversionGrid(events, horizonDays)
    grid
      .withColumn("hz", expr("(d * 1000000000) div n_risk"))
      .withColumn("ch", sum(col("hz")).over(
        Window.orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("d") > 0)
      .select(col("h").as("dur_h"), col("n_risk"),
        col("d").as("n_events"), col("c").as("n_censored"),
        col("hz").cast("long").as("hazard_nano"),
        col("ch").cast("long").as("cum_hazard_nano"))
  }

  private val kmSchema = StructType(Seq(
    StructField("dur_h", LongType, nullable = false),
    StructField("n_risk", LongType, nullable = false),
    StructField("n_events", LongType, nullable = false),
    StructField("n_censored", LongType, nullable = false),
    StructField("km_surv_e12", LongType, nullable = false)))

  /** Kaplan–Meier survival curve of non-conversion: S(t) = Π_{h≤t}
    * (n_h − d_h)/n_h over event hours, folded as an exact integer
    * recurrence S ← ⌊S·(n−d)/n⌋ from S₀ = 10¹² — a sequential
    * truncation both engines replay exactly (the oracle unrolls the
    * same recurrence as a recursive CTE over the indexed grid). The
    * fold runs on the driver over the COLLECTED grid — bounded by
    * construction to horizonDays·24+1 rows (the PcaOps/BPE bounded-
    * collect pattern: dim-sized by the operator's own definition,
    * never by data).
    */
  def kaplanMeierConversion(events: DataFrame,
      horizonDays: Int = 14): DataFrame = {
    val spark = events.sparkSession
    val grid = conversionGrid(events, horizonDays)
      .select(col("h"), col("d"), col("c"), col("n_risk"))
      .collect()
      .sortBy(_.getLong(0))
    var s = BigInt(1000000000000L)
    val rows = Seq.newBuilder[Row]
    grid.foreach { r =>
      val h = r.getLong(0); val d = r.getLong(1)
      val c = r.getLong(2); val n = r.getLong(3)
      if (d > 0) {
        s = s * BigInt(n - d) / BigInt(n) // BigInt: S·(n−d) crosses 2⁶³
        rows += Row(h, n, d, c, s.toLong)
      }
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.result(): _*), kmSchema)
  }
}
