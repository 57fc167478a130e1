package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators (SURVEY §2.E). Each has a batch form (used by
  * the correctness gate — identical semantics, oracle-checkable) and a
  * Structured Streaming form (watermark + windowed aggregation;
  * flatMapGroupsWithState sessionization) exercised in the test suite via
  * the same testdata driven through a streaming source.
  *
  * The Airflow-DAG cadence of the reference (nyc_ingestion_dag.py) is
  * what these replace: instead of a scheduled re-run over staging, the
  * stream maintains the same aggregates incrementally.
  */
object EventStreams {

  // ---------------------------------------------------------------- batch

  /** Tumbling 1-hour window aggregation per event type (batch form).
    * sum_value is an exact decimal sum projected as a rounded DOUBLE —
    * fixed-scale DECIMAL outputs are hash-unsafe across engines.
    */
  def tumblingAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour")("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))

  /** 30-minute-gap sessionization per user via window functions (batch
    * form): one shuffle on user_id, lag + running sum for session ids,
    * then per-user session stats. Second-floored epochs for oracle parity
    * (events.parquet is ns-precision; engines truncate differently).
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("long").as("ts_s"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_s")) - min(col("ts_s"))).as("duration_s"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("duration_s")).as("max_session_s"),
        round(sum(col("n_events")).cast("double") / count(lit(1)).cast("double"), 4)
          .as("avg_events_per_session"))
  }

  /** Hopping (sliding) 1-hour window with 15-minute slide per event type
    * (batch form): every event lands in exactly 4 overlapping windows —
    * the dashboard-smoothing aggregation tumbling windows can't express.
    * Spark's `window(ts, len, slide)` explodes to the covering windows
    * inside codegen; state and shuffle scale with (windows × types), not
    * events.
    */
  def hoppingAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes")("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))

  /** Streaming form of [[hoppingAggBatch]]: watermark bounds how long
    * each of the 4 covering windows stays open.
    */
  def hoppingAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessions via Spark's native session_window (merges rows
    * whose gaps are < the timeout; works identically under
    * readStream+watermark). Batch form for the oracle gate.
    */
  def sessionWindowBatch(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  // ------------------------------------------------------------ streaming

  /** Streaming session_window form of [[sessionWindowBatch]]: late events
    * inside the watermark horizon merge into (or bridge) their session —
    * state per user is the open session aggregate, emitted (append mode)
    * once the watermark passes the session end and then evicted, so state
    * is bounded by concurrently-open sessions at any throughput.
    */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming tumbling aggregation: 10-minute watermark + 1-hour window.
    * Same output schema as [[tumblingAggBatch]].
    */
  def tumblingAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Batch form of the purchase↔signup interval join: each purchase
    * paired with every signup of the same user in the preceding hour.
    */
  def intervalJoinBatch(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    purchases.join(signups, Seq("user_id"))
      .filter(col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("signup_id"),
        col("purchase_value"),
        (col("p_ts").cast("long") - col("s_ts").cast("long")).as("lag_seconds"))
  }

  /** Stream-stream interval join: both sides watermarked, join bounded to
    * the preceding hour so state for either side is evicted once the
    * watermark passes the bound — constant state per user-hour at any
    * throughput. Same output as [[intervalJoinBatch]].
    */
  def intervalJoinStream(purchases: DataFrame, signups: DataFrame): DataFrame = {
    val p = purchases.withWatermark("p_ts", "10 minutes")
    val s = signups.withWatermark("s_ts", "2 hours")
    p.join(s,
      p("user_id") === s("user_id") &&
        s("s_ts") <= p("p_ts") &&
        s("s_ts") >= p("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(p("user_id"), col("purchase_id"), col("signup_id"),
        col("purchase_value"),
        (col("p_ts").cast("long") - col("s_ts").cast("long")).as("lag_seconds"))
  }

  /** Streaming exact dedup: drop re-delivered event_ids within the
    * watermark horizon — the streaming form of the batch
    * `dropDuplicates("event_id")` in CleanOps.cleanEvents. State is one
    * (event_id, ts) entry per id inside the watermark, evicted as the
    * watermark advances.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming incremental dimension maintenance — the reference's
    * Airflow load_dim_date / dim-upsert loop (nyc_hybrid_etl_pipeline.py:
    * 141-180) as a foreachBatch stream: each micro-batch anti-joins its
    * new keys against the dim store and appends only unseen rows.
    * Replay safety: foreachBatch re-delivers a micro-batch with the SAME
    * batchId after a failure, and the marker write is a separate step
    * from the parquet append, so a crash between the two re-runs the
    * batch body. That re-run is idempotent anyway — the anti-join runs
    * against the FRESHLY-read store, which already contains the committed
    * append (the parquet job commit is all-or-nothing, and half-written
    * `_temporary` files are invisible to the re-read), so the retry
    * appends zero rows and then writes the marker. The marker is a
    * fast-path skip of the store re-read, not the correctness mechanism
    * (a Delta/Iceberg MERGE subsumes all of this in production).
    */
  def incrementalDimStream(events: DataFrame, dimPath: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events
      .select(col("user_id"), col("event_type"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = java.nio.file.Paths.get(s"$dimPath-commits", s"batch-$batchId")
        if (!java.nio.file.Files.exists(marker)) {
          val spark = batch.sparkSession
          val incoming = batch.select(col("user_id")).distinct()
          val existing =
            try spark.read.parquet(dimPath).select("user_id")
            catch { case _: Exception => spark.emptyDataFrame.withColumn("user_id", lit(0L)).limit(0) }
          incoming.join(existing, Seq("user_id"), "left_anti")
            .write.mode("append").parquet(dimPath)
          java.nio.file.Files.createDirectories(marker.getParent)
          java.nio.file.Files.createFile(marker)
        }
        ()
      }

  case class SessionEvent(user_id: Long, event_id: Long, ts_s: Long)
  case class SessionState(sessionCount: Long, eventCount: Long, lastTs: Long,
      sessionStart: Long, maxDuration: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long,
      max_session_s: Long)

  /** Streaming sessionization with explicit state per user — the
    * mapGroupsWithState path a 100 TB/day event feed needs (state is one
    * small record per user, not the event history).
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[SessionEvent],
      gapSeconds: Long = 1800): Dataset[UserSessions] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (userId, batch, state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_s, e.event_id))
          var s = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            s =
              if (s.lastTs == Long.MinValue || e.ts_s - s.lastTs > gapSeconds)
                s.copy(sessionCount = s.sessionCount + 1, eventCount = s.eventCount + 1,
                  lastTs = e.ts_s, sessionStart = e.ts_s)
              else {
                val dur = e.ts_s - s.sessionStart
                s.copy(eventCount = s.eventCount + 1, lastTs = e.ts_s,
                  maxDuration = math.max(s.maxDuration, dur))
              }
          }
          state.update(s)
          UserSessions(userId, s.sessionCount, s.eventCount, s.maxDuration)
      }
  }
}
