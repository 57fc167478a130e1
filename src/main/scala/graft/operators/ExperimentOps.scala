package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment (A/B) readout operators over the event stream — the
  * analysis layer a growth/ML team runs on top of the warehouse: arm
  * assignment is the deterministic md5-parity hash split (the
  * dataset_split idiom, shared with [[SurvivalOps.logrankConversionAb]])
  * so the null 50/50 split is the CALIBRATION story and a real
  * treatment column swaps in.
  */
object ExperimentOps {

  /** CUPED-adjusted experiment readout (Deng et al. 2013) of per-user
    * purchase revenue: the post-period metric Y is variance-reduced by
    * the PRE-period covariate X via θ = cov(X,Y)/var(X), the standard
    * industry technique for tightening A/B confidence without touching
    * the treatment effect (E[X] is unaffected by treatment, so
    * Y − θ(X − X̄) is unbiased for the effect with variance scaled by
    * 1 − ρ²). The observation span splits at first-event + splitDays;
    * the readout reports both the raw and the CUPED-adjusted
    * between-arm effect, the achievable variance reduction ρ², and the
    * sample-ratio-mismatch z (the first thing to check before trusting
    * any experiment readout).
    *
    * Exactness: per-user pre/post cent sums are exact; pooled moments
    * (n, ΣX, ΣY, ΣX², ΣXY, ΣY²) and per-arm sums are exact
    * DECIMAL(38,0); the raw effect is truncated integer micro-cents
    * (never a rounded double — the .5-boundary rule); θ, the CUPED
    * effect, ρ², and the SRM z are single FIXED double expression trees
    * over those exact integers.
    *
    * Scale: one fact-sized map-side-combined rollup to the user grain
    * (one shuffle on user_id); everything after is a 1-row fold.
    */
  def abCupedReadout(events: DataFrame, splitDays: Int = 15): DataFrame = {
    val split = events.agg((min(unix_timestamp(col("ts"))) +
      lit(splitDays.toLong * 86400L)).as("split_s"))
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val isP = col("event_type") === "purchase"
    val ts = unix_timestamp(col("ts"))
    val u = events.filter(col("user_id").isNotNull)
      .crossJoin(broadcast(split))
      .groupBy(col("user_id"),
        pmod(graft.functions.HashFns.hash32(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2))
          .cast("long").as("arm"))
      .agg(
        coalesce(sum(when(isP && ts < col("split_s"), cents)), lit(0L))
          .as("x"),
        coalesce(sum(when(isP && ts >= col("split_s"), cents)), lit(0L))
          .as("y"))
    val pool = u.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
      sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    val arms = u.agg(
      coalesce(sum(when(col("arm") === 0, lit(1L))), lit(0L)).as("n0"),
      coalesce(sum(when(col("arm") === 0, col("x"))), lit(0L))
        .cast("decimal(38,0)").as("sx0"),
      coalesce(sum(when(col("arm") === 0, col("y"))), lit(0L))
        .cast("decimal(38,0)").as("sy0"),
      coalesce(sum(when(col("arm") === 1, lit(1L))), lit(0L)).as("n1"),
      coalesce(sum(when(col("arm") === 1, col("x"))), lit(0L))
        .cast("decimal(38,0)").as("sx1"),
      coalesce(sum(when(col("arm") === 1, col("y"))), lit(0L))
        .cast("decimal(38,0)").as("sy1"))
    pool.crossJoin(broadcast(arms))
      .filter(col("n") > 0)
      .withColumn("vx", expr("n * sxx - sx * sx"))
      .withColumn("vy", expr("n * syy - sy * sy"))
      .withColumn("cxy", expr("n * sxy - sx * sy"))
      .withColumn("theta", when(col("vx") > 0,
        expr("cast(cxy as double) / cast(vx as double)")))
      .select(col("n0").as("n_users_a"), col("n1").as("n_users_b"),
        when(col("n0") + col("n1") > 0, expr(
          """round((cast(n1 as double) - cast(n0 as double))
            | / sqrt(cast(n1 + n0 as double)), 4)""".stripMargin))
          .as("srm_z_r4"),
        round(col("theta"), 6).as("theta_r6"),
        when(col("n1") > 0 && col("n0") > 0, expr(
          "(sy1 * 1000000) div n1 - (sy0 * 1000000) div n0").cast("long"))
          .as("effect_raw_microcents"),
        when(col("n1") > 0 && col("n0") > 0 && col("theta").isNotNull, expr(
          """round((cast(sy1 as double) / cast(n1 as double)
            | - cast(sy0 as double) / cast(n0 as double))
            | - theta * (cast(sx1 as double) / cast(n1 as double)
            | - cast(sx0 as double) / cast(n0 as double)), 4)""".stripMargin))
          .as("effect_cuped_cents_r4"),
        when(col("vx") > 0 && col("vy") > 0, expr(
          """round(cast(cxy as double) * cast(cxy as double)
            | / (cast(vx as double) * cast(vy as double)), 6)""".stripMargin))
          .as("var_reduction_r6"))
  }

  /** Wilson 95% score interval for each arm's conversion rate — the
    * per-arm readout next to [[abCupedReadout]]'s effect estimate and
    * [[SurvivalOps.logrankConversionAb]]'s rate test: the interval that
    * stays honest at small n and extreme p̂ where the Wald ±z√(p̂q̂/n)
    * collapses (Wilson 1927; Brown–Cai–DasGupta 2001's recommendation).
    *
    * EXACT integer edition: with z = 1.96 = 49/25 (z² = 2401/625
    * rational), both bounds reduce to
    *   (1250·n·c + 2401·n ± 49·√(A·n)) / (1250·n² + 4802·n),
    *   A = 2500·c·(n−c) + 2401·n
    * — all DECIMAL(38,0) except the single √, which is the exact
    * integer floor-sqrt: a double seed, ONE integer Newton step
    * s₂ = (s₁ + ⌊an/s₁⌋) div 2, then the ±1 correction with
    * decimal-checked squares. The Newton step matters once √an exceeds
    * 2⁵³ (an ≳ 8·10³¹ — arms of a few billion users at 100 TB): there
    * the double seed can be off by more than 1 (up to ~√an·2⁻⁵² for
    * an < 10³⁸), but one Newton step from a seed with error e leaves
    * error ≤ ⌈e²/(2√an)⌉ ≤ 1, always from above (AM–GM), which the
    * checked ladder removes — exact for every an a DECIMAL(38,0)/
    * HUGEINT can hold whose root fits in BIGINT (an ≤ ~8.5·10³⁷).
    * Floor-isqrt keeps both bounds inside [0, 10⁶] micro by
    * construction (at c = 0, A·n = 2401n² is a perfect square and the
    * lower bound is exactly 0). Conversion = the user ever purchased.
    *
    * Scale: one map-side-combined rollup to the user grain (the one
    * fact shuffle), then a 2-row fold. Nothing driver-side.
    */
  def abWilsonBounds(events: DataFrame): DataFrame = {
    val perUser = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"),
        pmod(graft.functions.HashFns.hash32(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2))
          .cast("long").as("arm"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
    perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .withColumn("an", expr(
        "(cast(2500 as decimal(38,0)) * c * (n - c) + cast(2401 as decimal(38,0)) * n) * n"))
      .withColumn("s1", expr("cast(floor(sqrt(cast(an as double))) as bigint)"))
      .withColumn("s2", expr("(s1 + (an div s1)) div 2"))
      .withColumn("s", expr("""case
        | when cast(s2 + 1 as decimal(38,0)) * (s2 + 1) <= an then s2 + 1
        | when cast(s2 as decimal(38,0)) * s2 > an then s2 - 1
        | else s2 end""".stripMargin.replaceAll("\n", " ")))
      .withColumn("num", expr(
        "cast(1250 as decimal(38,0)) * n * c + cast(2401 as decimal(38,0)) * n"))
      .withColumn("den", expr(
        "cast(1250 as decimal(38,0)) * n * n + cast(4802 as decimal(38,0)) * n"))
      .select(col("arm"), col("n").as("n_users"), col("c").as("n_converted"),
        expr("cast((c * 1000000) div n as bigint)").as("p_micro"),
        expr("cast(((num - cast(49 as decimal(38,0)) * s) * 1000000) div den as bigint)")
          .as("wilson_lo_micro"),
        expr("cast(((num + cast(49 as decimal(38,0)) * s) * 1000000) div den as bigint)")
          .as("wilson_hi_micro"))
  }
}
