package graft.operators

import org.apache.spark.sql.DataFrame
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
      ordCol: String, valueCol: String): DataFrame = {
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
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
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
}
