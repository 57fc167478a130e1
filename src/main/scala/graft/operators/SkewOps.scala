package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities. AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin, on in GraftSession) covers sort-merge
  * cases; explicit salting is the deterministic fallback when one side has
  * pathological hot keys (the 100 TB reality: a handful of users/cells
  * holding 1% of all rows each).
  */
object SkewOps {

  /** Inner equi-join with the left (large, skewed) side salted into
    * `salts` sub-keys and the right side replicated `salts` times, so a
    * hot key's rows spread across `salts` reducers instead of one.
    *
    * Result equals `left.join(right, key)` exactly; only the physical
    * distribution changes.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-segment event totals routed through [[saltedJoin]] — the
    * skew-handling plan carrying a real reporting query, oracle-checked
    * against the plain-join SQL (the whole point: salting changes ONLY
    * the physical distribution, never the result). The events side is
    * the skewed one (a handful of hot users hold most rows); the rollup
    * is map-side combined and exact (cents).
    */
  def segmentEventTotals(events: DataFrame, customer: DataFrame,
      salts: Int = 8): DataFrame =
    saltedJoin(
      events.filter(col("user_id").isNotNull)
        .select(col("user_id"), col("value")),
      customer.select(col("c_custkey").as("user_id"), col("c_mktsegment")),
      "user_id", salts)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
          .as("value_cents"))

  /** Join-key skew profile — the diagnostic run BEFORE choosing between
    * plain shuffle, broadcast, AQE, or [[saltedJoin]]: per audited key,
    * its cardinality, the hottest value's row share, and the skew factor
    * (hottest count ÷ mean count; 10⁶ = perfectly uniform). Null keys
    * count as a group of their own — they're the most common hot "key"
    * in the wild.
    *
    * Scale: one map-side-combined grouped count per key (the same
    * shuffle the join being diagnosed would pay), folded to ONE row by
    * commutative aggregates; the hottest key rides a min(struct) — no
    * second pass, no driver-side top-k. Shares/factors in exact integer
    * micro-units (DECIMAL(38,0) products — cnt·n_keys crosses 2⁶³ at
    * corpus scale).
    */
  def keySkewReport(keys: Seq[(String, DataFrame, String)]): DataFrame =
    keys.map { case (name, df, kcol) =>
      df.select(coalesce(col(kcol).cast("string"), lit("<null>")).as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
          // min over (−cnt, k) = max count, ties broken by smallest key
          min(struct((-col("cnt")).as("neg"), col("k").as("k"))).as("top"))
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
          (-col("top.neg")).as("max_cnt"), col("top.k").as("top_key"))
        .withColumn("max_share_micro",
          expr("(cast(max_cnt as decimal(38,0)) * 1000000) div n_rows"))
        .withColumn("skew_factor_micro",
          expr("(cast(max_cnt as decimal(38,0)) * n_keys * 1000000) div n_rows"))
    }.reduce(_ unionAll _)
}
