package graft.operators

import graft.functions.Geohash.geohash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cleaning / enrichment operators — Spark-first re-expression of the
  * reference's Glue/Lambda cleaning passes
  * (`/root/reference/src/311 /glue_job_clean_311.py:116-142`,
  * `/root/reference/src/Airbnb/airbnb_clean_data.py:36-120`).
  *
  * Every transform is a declarative column expression: filters sit first so
  * Catalyst pushes them into the parquet scan, normalization/dedup happen
  * on the pruned projection, and nothing leaves whole-stage codegen.
  */
object CleanOps {

  /** Null/range filtering + text normalization + exact dedup + derived
    * date/hour columns (ref: glue_job_clean_311.py lat/lon box filter,
    * trim/upper, dropDuplicates, created_year).
    */
  def cleanEvents(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .filter(col("value") >= 0.0 && col("value") <= 400.0)
      .dropDuplicates("event_id")
      .select(
        col("event_id"),
        col("user_id"),
        upper(trim(col("event_type"))).as("event_type"),
        col("value"),
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).as("event_hour"))

  /** Multi-format timestamp parsing + local→UTC normalization (ref:
    * glue_job_clean_311.py:40-46 `parse_timestamp` — including the AM/PM
    * forms "MM/dd/yyyy hh:mm:ss a" / "M/d/yyyy h:mm:ss a" — and :120-121
    * `to_utc_timestamp(ts, "America/New_York")`). The raw strings are
    * derived deterministically from events.ts in four formats so the
    * oracle can rebuild the identical input.
    *
    * DST-ambiguous wall-clock times (first-Sunday-of-November 01:xx, which
    * occurs twice) are normalized to NULL: JDK resolves them to the
    * earlier (EDT) instant while ICU-based engines pick the later (EST)
    * one, so an ambiguous local time has no engine-independent UTC value —
    * rejecting it is the only reproducible cleaning semantic. Gap times
    * (second-Sunday-of-March 02:xx, which never occur) shift forward
    * identically in both engines and are kept.
    */
  def parseTimestamps(events: DataFrame): DataFrame = {
    val raw = events.select(
      col("event_id"),
      when(col("event_id") % 4 === 0, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
        .when(col("event_id") % 4 === 1, date_format(col("ts"), "MM/dd/yyyy hh:mm:ss a"))
        .when(col("event_id") % 4 === 2, date_format(col("ts"), "M/d/yyyy h:mm:ss a"))
        .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .as("raw_ts"))
    val parsed = coalesce(
      try_to_timestamp(col("raw_ts"), lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(col("raw_ts"), lit("MM/dd/yyyy hh:mm:ss a")),
      try_to_timestamp(col("raw_ts"), lit("M/d/yyyy h:mm:ss a")),
      try_to_timestamp(col("raw_ts"), lit("yyyy-MM-dd HH:mm:ss")))
    val ambiguous = month(col("parsed_ts")) === 11 &&
      dayofmonth(col("parsed_ts")) <= 7 &&
      weekday(col("parsed_ts")) === 6 &&
      hour(col("parsed_ts")) === 1
    raw.select(col("event_id"), col("raw_ts"), parsed.as("parsed_ts"))
      .withColumn("utc_ts",
        when(ambiguous, lit(null).cast("timestamp"))
          .otherwise(to_utc_timestamp(col("parsed_ts"), "America/New_York")))
  }

  /** Price-string cleaning: strip currency symbols/thousands separators,
    * TRY_CAST-reject unparseable values (NaN/INF/empty/garbage — the
    * Airbnb notebook's `price NOT IN ('NaN','nan','','INF','-INF')` +
    * `TRY_CAST ... IS NOT NULL` guard), and emit a per-row validity flag
    * so the reject path is exercised and countable. Dirty variants are
    * synthesized deterministically from o_orderkey so the oracle can
    * rebuild the identical input. The final price is projected as a
    * rounded DOUBLE — fixed-scale DECIMAL output columns are hash-unsafe
    * across engines (trailing-zero rendering); decimal math stays
    * internal (ref: airbnb_clean_data.py:43-49, Airbnb Analysis q1).
    */
  def priceClean(orders: DataFrame): DataFrame = {
    val dirty = orders.select(
      col("o_orderkey"),
      when(col("o_orderkey") % 50 === 0, lit("NaN"))
        .when(col("o_orderkey") % 50 === 1, lit(""))
        .when(col("o_orderkey") % 50 === 2, lit("INF"))
        .when(col("o_orderkey") % 50 === 3, lit("-INF"))
        .when(col("o_orderkey") % 50 === 4, lit("N/A"))
        .otherwise(
          concat(lit("$"), col("o_totalprice").cast("decimal(18,2)").cast("string")))
        .as("price_raw"))
    // try_cast to DECIMAL rejects NaN/INF/empty in BOTH engines (a double
    // cast would happily parse 'NaN'/'INF'); the valid path round-trips
    // through exact decimal before the final double projection.
    val parsed = expr("try_cast(regexp_replace(price_raw, '[$,]', '') AS decimal(18,2))")
    dirty.select(
      col("o_orderkey"),
      col("price_raw"),
      round(parsed.cast("double"), 2).as("price"),
      parsed.isNotNull.as("is_valid"))
  }

  /** JSON property extraction from the raw-ingestion props payload (ref:
    * the Mongo→S3 raw JSON stage; get_json_object stays codegen-friendly).
    */
  def jsonExtractProps(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .filter(col("k").isNotNull)

  /** JSON SCHEMA-DISCOVERY profile — the semi-structured-ingest audit a
    * lake team runs before writing an extraction job: which keys exist
    * across the raw payloads, how often each is present, how many
    * distinct values it takes, and whether every observed value parses
    * as a number (the implied column type). Keys are DISCOVERED (map
    * parse + explode), not enumerated — the whole point when the
    * upstream schema drifts. Payload variety is synthesized
    * deterministically from event_id (the pii_redact pattern: the
    * testdata's props is single-key, and the oracle must rebuild the
    * identical input).
    *
    * Scale: one parse + explode scan, map-side-combined rollup to the
    * KEY grain (payload keyspace, not rows); the total is a 1-row
    * broadcast. Type inference is an aggregate of a codegen'd regex,
    * never a second pass.
    */
  def jsonKeyProfile(events: DataFrame): DataFrame = {
    val id = col("event_id")
    val jstr = when(id % 4 === 0,
        concat(lit("""{"k": """), (id % 100).cast("string"),
          lit(""", "device": "ios", "price": """),
          (id % 90).cast("string"), lit(""".5}""")))
      .when(id % 4 === 1,
        concat(lit("""{"k": """), (id % 100).cast("string"),
          lit(""", "device": "android"}""")))
      .when(id % 4 === 2,
        concat(lit("""{"k": """), (id % 100).cast("string"),
          lit(""", "price": """), (id % 90).cast("string"), lit(""".25}""")))
      .otherwise(concat(lit("""{"k": """), (id % 100).cast("string"), lit("}")))
    val total = events.agg(count(lit(1)).as("n_events"))
    events
      .select(explode(from_json(jstr,
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("key", "v")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        countDistinct(col("v")).as("n_values"),
        min(when(col("v").rlike("^-?[0-9]+(\\.[0-9]+)?$"), 1L).otherwise(0L))
          .as("all_numeric"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_present"),
        expr("(n_present * 1000000) div n_events").as("present_share_micro"),
        col("n_values"),
        when(col("all_numeric") === 1L, "number").otherwise("string")
          .as("inferred_type"))
  }

  /** Geohash enrichment on deterministically derived NYC-box coordinates
    * (testdata has no lat/lon; SURVEY §3). Uses the native codegen'd
    * GeohashExpr — the reference's Python UDF equivalent
    * (glue_job_clean_311.py:51-86) at ~0 marginal cost per row.
    */
  def geohashEncode(customer: DataFrame): DataFrame = {
    val withCoords = customer.select(
      col("c_custkey"),
      (lit(40.4) + (col("c_custkey") % 593).cast("double") * lit(0.001)).as("lat"),
      (lit(-74.3) + (col("c_custkey") % 599).cast("double") * lit(0.001)).as("lon"))
    withCoords.withColumn("geohash", geohash(col("lat"), col("lon"), 7))
  }

  /** Shared derived-coordinate helper for other operators. */
  def withDerivedCoords(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("lat", lit(40.4) + (col(keyCol) % 593).cast("double") * lit(0.001))
      .withColumn("lon", lit(-74.3) + (col(keyCol) % 599).cast("double") * lit(0.001))

  /** Column null-profile — the data-quality audit pass that gates an
    * ingest (the reference eyeballs this per notebook; here it is one
    * operator): per column, row count, null count, and null rate in
    * exact integer micro-units. ONE scan with conditional sums (no
    * multi-distinct Expand, no per-column rescans); the stack() unpivot
    * runs on the single aggregated row.
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val agg = df.agg(
      count(lit(1)).as("n_rows"),
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_$c")): _*)
    val stackArgs = cols.map(c => s"'$c', n_$c").mkString(", ")
    agg.select(col("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) as (column_name, n_null)"))
      .select(col("column_name"), col("n_rows"), col("n_null"),
        expr("(n_null * 1000000) div n_rows").as("null_micro"))
  }
}
