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
}
