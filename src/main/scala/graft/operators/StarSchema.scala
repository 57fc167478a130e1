package graft.operators

import graft.functions.Geohash.geohash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema construction — Spark-first re-expression of the reference's
  * dimensional model (`/root/reference/src/Airbnb/lambda_transform_airbnb
  * .py` dim/fact builds, `/root/reference/src/311 /nyc_hybrid_etl_pipeline
  * .py:57-223` incremental dim_date/dim/fact loads).
  *
  * Scale notes: dims are tiny → always the broadcast side of fact joins;
  * date keys are yyyyMMdd ints so fact partition pruning stays numeric;
  * incremental loads are `left_anti` joins (Spark's NOT EXISTS), which AQE
  * turns into broadcast hash anti-joins when the existing-keys side fits.
  */
object StarSchema {

  private def dateKey(d: org.apache.spark.sql.Column) =
    date_format(d, "yyyyMMdd").cast("int")

  /** Shared date dimension from the union of all fact date columns (ref:
    * nyc_hybrid_etl_pipeline.py:57-101 — date_id yyyyMMdd, ISO weekday,
    * weekend flag; month/day names in English as Redshift's TO_CHAR).
    */
  def dimDate(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val dates = orders.select(to_date(col("o_orderdate")).as("d"))
      .union(lineitem.select(to_date(col("l_shipdate")).as("d")))
      .filter(col("d").isNotNull)
      .distinct()
    dates.select(
      dateKey(col("d")).as("date_id"),
      col("d").as("date_value"),
      year(col("d")).as("year"),
      quarter(col("d")).as("quarter"),
      month(col("d")).as("month"),
      date_format(col("d"), "MMMM").as("month_name"),
      dayofmonth(col("d")).as("day"),
      (weekday(col("d")) + 1).as("day_of_week"),
      date_format(col("d"), "EEEE").as("day_name"),
      (weekday(col("d")) + 1 >= 6).as("is_weekend"))
  }

  /** Customer dimension denormalized over nation/region + geo enrichment
    * (ref: lambda_transform_airbnb.py dim_location — geohash, coords,
    * borough/neighbourhood denorm). nation/region are broadcast.
    */
  def dimCustomerGeo(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("c_custkey"),
        col("c_name"),
        col("c_mktsegment"),
        col("n_name").as("nation"),
        col("r_name").as("region"),
        (lit(40.4) + (col("c_custkey") % 593).cast("double") * lit(0.001)).as("lat"),
        (lit(-74.3) + (col("c_custkey") % 599).cast("double") * lit(0.001)).as("lon"))
      .withColumn("geohash", geohash(col("lat"), col("lon"), 7))

  /** Supplier dimension — the second geo domain (ref: dim_host/property). */
  def dimSupplierGeo(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    supplier
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("s_suppkey"),
        col("s_name"),
        col("n_name").as("nation"),
        col("r_name").as("region"),
        (lit(40.4) + (col("s_suppkey") % 593).cast("double") * lit(0.001)).as("lat"),
        (lit(-74.3) + (col("s_suppkey") % 599).cast("double") * lit(0.001)).as("lon"))
      .withColumn("geohash", geohash(col("lat"), col("lon"), 7))

  /** Order-grain fact with dim keys resolved (ref: nyc_hybrid_etl_pipeline
    * .py:184-223 fact_311_complaint build — date keys + dim FK lookups via
    * joins on the broadcastable dims).
    */
  def factOrders(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
        orders("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(
        col("o_orderkey"),
        dateKey(col("o_orderdate")).as("order_date_key"),
        col("o_custkey"),
        col("n_name").as("nation"),
        col("c_mktsegment").as("segment"),
        col("o_orderstatus"),
        col("o_orderpriority"),
        // final projection to rounded DOUBLE: fixed-scale DECIMAL output
        // renders trailing zeros and is hash-unsafe across engines
        round(col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
          .as("total_price"))

  /** Line-grain fact: ship/order date keys + exact-decimal revenue measure.
    * orders joins on the shuffle key (o_orderkey == l_orderkey); at scale
    * both sides are large → shuffle hash join on the same key, no extra
    * repartition needed downstream for orderkey-grouped aggs.
    */
  def factLineitem(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders.select("o_orderkey", "o_orderdate"),
        lineitem("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        dateKey(col("o_orderdate")).as("order_date_key"),
        dateKey(col("l_shipdate")).as("ship_date_key"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .as("days_to_ship"),
        // exact decimal arithmetic internally (scale 2 × scale 2 → scale 4),
        // final projection to rounded DOUBLE (decimal outputs hash-unsafe)
        round((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(18,4)").cast("double"), 4).as("revenue"),
        col("l_returnflag"),
        col("l_linestatus"))

  /** Incremental dim load: rows arriving after the cutoff whose key is not
    * already in the dim (ref: nyc_hybrid_etl_pipeline.py:141-180 — INSERT
    * … WHERE NOT EXISTS, expressed as left_anti).
    */
  def incrementalDimLoad(orders: DataFrame, customer: DataFrame, cutoff: String): DataFrame = {
    val existing = orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val incoming = orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    incoming
      .join(existing, Seq("o_custkey"), "left_anti")
      .join(customer, col("o_custkey") === customer("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** SCD Type-2 dimension versioning: one row per (customer, active
    * year) with [valid_from, valid_to) ranges chained via lead() — the
    * slowly-changing-dimension pattern Redshift models with effective
    * dates (ref: the dim tables + incremental-load machinery, made
    * history-preserving). valid_to is NULL on the current version.
    */
  def scd2CustomerVersions(orders: DataFrame, customer: DataFrame): DataFrame = {
    val versions = orders
      .join(customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), year(col("o_orderdate")).as("version_year"),
        col("c_mktsegment"))
      .agg(min(to_date(col("o_orderdate"))).as("valid_from"),
        count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("version_year"))
    versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental fact load: anti-join on the fact PK against the already-
    * loaded set (ref: fact_311_complaint `f.complaint_id IS NULL` guard).
    * The "already loaded" set is simulated as every 7th order.
    */
  def incrementalFactLoad(orders: DataFrame): DataFrame = {
    val existing = orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey")
    orders
      .join(existing, Seq("o_orderkey"), "left_anti")
      .select(
        col("o_orderkey"),
        dateKey(col("o_orderdate")).as("order_date_key"),
        col("o_custkey"),
        round(col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
          .as("total_price"))
  }
}
