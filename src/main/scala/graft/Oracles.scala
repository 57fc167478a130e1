package graft

import graft.OracleSql._

/** DuckDB oracle SQL for every `SparkEntry.queries` key (SURVEY §2).
  * Each statement is the ANSI re-statement of the operator's semantics;
  * numeric policy mirrors graft.operators.Analytics (exact decimal sums,
  * double division only at the end, identical op order → identical IEEE
  * results).
  */
object Oracles {

  private val aCleaning: Map[String, String] = Map(
    "clean_events" ->
      """SELECT event_id, user_id, upper(trim(event_type)) AS event_type, value,
        | CAST(ts AS DATE) AS event_date, CAST(hour(ts) AS INT) AS event_hour
        |FROM events
        |WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  AND value >= 0.0 AND value <= 400.0""".stripMargin,

    "parse_timestamps" ->
      """WITH raw AS (
        | SELECT event_id,
        |  CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
        |       WHEN event_id % 3 = 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
        |       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS raw_ts
        | FROM events)
        |SELECT event_id, raw_ts,
        | COALESCE(try_strptime(raw_ts, '%Y-%m-%dT%H:%M:%S'),
        |          try_strptime(raw_ts, '%m/%d/%Y %H:%M:%S'),
        |          try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S')) AS parsed_ts
        |FROM raw""".stripMargin,

    "price_clean" ->
      """SELECT o_orderkey,
        | '$' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_raw,
        | CAST(regexp_replace('$' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |                     '[$,]', '', 'g') AS DECIMAL(18,2)) AS price
        |FROM orders""".stripMargin,

    "json_extract_props" ->
      """SELECT event_id,
        | CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS INT) AS k, value
        |FROM events
        |WHERE NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') IS NOT NULL""".stripMargin,

    "geohash_encode" -> {
      s"""WITH c AS (SELECT c_custkey, ${latSql("c_custkey")} AS lat,
         | ${lonSql("c_custkey")} AS lon FROM customer),
         |g AS (SELECT c_custkey, lat, lon, ${geohashCols("lat", "lon")} FROM c)
         |SELECT c_custkey, lat, lon, g_gh AS geohash FROM g""".stripMargin
    }
  )

  private val bStarSchema: Map[String, String] = Map(
    "dim_date" ->
      """WITH dates AS (
        | SELECT DISTINCT d FROM (
        |   SELECT CAST(o_orderdate AS DATE) AS d FROM orders
        |   UNION ALL SELECT CAST(l_shipdate AS DATE) FROM lineitem)
        | WHERE d IS NOT NULL)
        |SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_id, d AS date_value,
        | CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
        | CAST(month(d) AS INT) AS month, monthname(d) AS month_name,
        | CAST(day(d) AS INT) AS day, CAST(isodow(d) AS INT) AS day_of_week,
        | dayname(d) AS day_name, isodow(d) >= 6 AS is_weekend
        |FROM dates""".stripMargin,

    "dim_customer_geo" ->
      s"""WITH c AS (
         | SELECT c_custkey, c_name, c_mktsegment, n_name AS nation, r_name AS region,
         |  ${latSql("c_custkey")} AS lat, ${lonSql("c_custkey")} AS lon
         | FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey),
         |g AS (SELECT *, ${geohashCols("lat", "lon")} FROM c)
         |SELECT c_custkey, c_name, c_mktsegment, nation, region, lat, lon,
         | g_gh AS geohash FROM g""".stripMargin,

    "dim_supplier_geo" ->
      s"""WITH s AS (
         | SELECT s_suppkey, s_name, n_name AS nation, r_name AS region,
         |  ${latSql("s_suppkey")} AS lat, ${lonSql("s_suppkey")} AS lon
         | FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey),
         |g AS (SELECT *, ${geohashCols("lat", "lon")} FROM s)
         |SELECT s_suppkey, s_name, nation, region, lat, lon, g_gh AS geohash FROM g""".stripMargin,

    "fact_orders" ->
      """SELECT o_orderkey,
        | CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
        | o_custkey, n_name AS nation, c_mktsegment AS segment,
        | o_orderstatus, o_orderpriority,
        | CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "fact_lineitem" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
        | CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS ship_date_key,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INT)
        |   AS days_to_ship,
        | CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2))
        |   - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS revenue,
        | l_returnflag, l_linestatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "incremental_dim_load" ->
      """WITH existing AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |incoming AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        |SELECT c_custkey, c_name, c_mktsegment
        |FROM incoming i JOIN customer ON i.o_custkey = c_custkey
        |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_custkey = i.o_custkey)""".stripMargin,

    "incremental_fact_load" ->
      """SELECT o_orderkey,
        | CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
        | o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin
  )

  private val cAnalytics: Map[String, String] = Map(
    "agg_region_pct" ->
      """SELECT r_name AS region, COUNT(*) AS total_orders,
        | ROUND(COUNT(*) * CAST(100.0 AS DOUBLE)
        |   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 2) AS pct
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "top_types_by_nation" ->
      """SELECT p_type, n_name AS nation, COUNT(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type, n_name
        |ORDER BY n_lines DESC, p_type, nation LIMIT 20""".stripMargin,

    "avg_duration_by_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        | ROUND(CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))
        |   AS DOUBLE) / COUNT(*), 2) AS avg_days_to_ship,
        | ROUND(CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))
        |   AS DOUBLE) / COUNT(*) / CAST(7.0 AS DOUBLE), 2) AS avg_weeks_to_ship
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "price_stats_by_region" ->
      """SELECT r_name AS region, COUNT(*) AS n_orders,
        | MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS min_price,
        | MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS max_price,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2)
        |   AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "revenue_by_nation_segment" ->
      """SELECT n_name AS nation, COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, COALESCE(c_mktsegment, 'UNKNOWN')""".stripMargin,

    "geo_join_counts" ->
      s"""WITH cc AS (SELECT c_custkey, ${latSql("c_custkey")} AS lat,
         |  ${lonSql("c_custkey")} AS lon FROM customer),
         |cg AS (SELECT c_custkey, ${geohashCols("lat", "lon")} FROM cc),
         |ss AS (SELECT s_suppkey, ${latSql("s_suppkey")} AS lat,
         |  ${lonSql("s_suppkey")} AS lon FROM supplier),
         |sg AS (SELECT s_suppkey, ${geohashCols("lat", "lon")} FROM ss)
         |SELECT cg.g_gh AS geohash,
         | COUNT(DISTINCT c_custkey) AS n_customers,
         | COUNT(DISTINCT s_suppkey) AS n_suppliers
         |FROM cg JOIN sg ON cg.g_gh = sg.g_gh
         |GROUP BY cg.g_gh""".stripMargin,

    "density_correlation" ->
      """WITH oc AS (
        |  SELECT c_nationkey AS nationkey,
        |   COUNT(DISTINCT o_orderkey) AS n_orders,
        |   COUNT(DISTINCT o_custkey) AS n_customers
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey),
        |sc AS (SELECT s_nationkey AS nationkey, COUNT(DISTINCT s_suppkey) AS n_suppliers
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT n_name AS nation, n_orders, n_customers,
        | COALESCE(n_suppliers, 0) AS n_suppliers,
        | ROUND(CAST(n_orders AS DOUBLE) / NULLIF(COALESCE(n_suppliers, 0), 0), 4)
        |   AS orders_per_supplier
        |FROM nation LEFT JOIN oc ON n_nationkey = oc.nationkey
        | LEFT JOIN sc ON n_nationkey = sc.nationkey
        |WHERE COALESCE(n_orders, 0) > 10""".stripMargin,

    "quarterly_trend" ->
      """WITH counts AS (
        | SELECT CAST(year(o_orderdate) AS INT) AS year,
        |  CAST(quarter(o_orderdate) AS INT) AS quarter,
        |  n_name AS nation, COUNT(*) AS n_orders
        | FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY 1, 2, 3)
        |SELECT year, quarter, nation, n_orders,
        | ROUND(CAST(SUM(n_orders) OVER (PARTITION BY year, quarter) AS DOUBLE)
        |   / CAST(COUNT(*) OVER (PARTITION BY year, quarter) AS DOUBLE), 2)
        |   AS avg_quarterly_orders
        |FROM counts""".stripMargin,

    "weekend_pattern" ->
      """SELECT CASE WHEN isodow(o_orderdate) >= 6 THEN 'Weekend' ELSE 'Weekday' END
        |   AS day_type,
        | r_name AS region, COUNT(*) AS n_orders,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2)
        |   AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "pct_fast_fulfillment" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        | SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
        |   <= 90 THEN 1 ELSE 0 END) AS n_fast,
        | ROUND(CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |   CAST(l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END) AS DOUBLE)
        |   * CAST(100.0 AS DOUBLE) / COUNT(*), 2) AS pct_fast
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin
  )

  val all: Map[String, String] = aCleaning ++ bStarSchema ++ cAnalytics
}
