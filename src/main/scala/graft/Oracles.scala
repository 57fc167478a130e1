package graft

import graft.OracleSql._

/** DuckDB oracle SQL for every `SparkEntry.queries` key (SURVEY §2).
  * Each statement is the ANSI re-statement of the operator's semantics;
  * numeric policy mirrors graft.operators.Analytics (exact decimal sums,
  * double division only at the end, identical op order → identical IEEE
  * results).
  */
object Oracles {

  /** parse_timestamps body — shared with the null_profile oracle, which
    * profiles the parsed output (the column set with genuine NULLs:
    * unparseable raws and the DST-ambiguous window).
    */
  private val parseTimestampsSql: String =
    """WITH raw AS (
      | SELECT event_id,
      |  CASE WHEN event_id % 4 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
      |       WHEN event_id % 4 = 1 THEN strftime(ts, '%m/%d/%Y %I:%M:%S %p')
      |       WHEN event_id % 4 = 2 THEN strftime(ts, '%-m/%-d/%Y %-I:%M:%S %p')
      |       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS raw_ts
      | FROM events),
      |parsed AS (
      | SELECT event_id, raw_ts,
      |  COALESCE(try_strptime(raw_ts, '%Y-%m-%dT%H:%M:%S'),
      |           try_strptime(raw_ts, '%m/%d/%Y %I:%M:%S %p'),
      |           try_strptime(raw_ts, '%-m/%-d/%Y %-I:%M:%S %p'),
      |           try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S')) AS parsed_ts
      | FROM raw)
      |SELECT event_id, raw_ts, parsed_ts,
      | CASE WHEN month(parsed_ts) = 11 AND day(parsed_ts) <= 7
      |       AND isodow(parsed_ts) = 7 AND hour(parsed_ts) = 1 THEN NULL
      |      ELSE timezone('UTC', timezone('America/New_York', parsed_ts)) END AS utc_ts
      |FROM parsed""".stripMargin

  /** price_clean body — shared with the null_profile oracle, which
    * profiles the cleaned output (the `price` column is NULL for every
    * dirty/unparseable raw — a guaranteed non-trivial null mix).
    */
  private val priceCleanSql: String =
    """WITH dirty AS (
      | SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 50 = 0 THEN 'NaN'
      |       WHEN o_orderkey % 50 = 1 THEN ''
      |       WHEN o_orderkey % 50 = 2 THEN 'INF'
      |       WHEN o_orderkey % 50 = 3 THEN '-INF'
      |       WHEN o_orderkey % 50 = 4 THEN 'N/A'
      |       ELSE '$' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
      |  END AS price_raw
      | FROM orders),
      |parsed AS (SELECT o_orderkey, price_raw,
      |  TRY_CAST(regexp_replace(price_raw, '[$,]', '', 'g') AS DECIMAL(18,2)) AS p
      | FROM dirty)
      |SELECT o_orderkey, price_raw,
      | ROUND(CAST(p AS DOUBLE), 2) AS price,
      | p IS NOT NULL AS is_valid
      |FROM parsed""".stripMargin

  /** lang_id body — shared with the lang_confusion oracle. */
  private val langIdSql: String = {
    val lists = graft.operators.TextOps.Stopwords.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(toks, x -> list_contains($arr, x))) AS BIGINT) AS s_$l"
    }.mkString(", ")
    s"""WITH t AS (SELECT doc_id, lang,
       |  CASE WHEN length(${normTextSql("text")}) = 0 THEN []
       |       ELSE string_split(${normTextSql("text")}, ' ') END AS toks
       | FROM documents),
       |s AS (SELECT doc_id, lang, $lists FROM t)
       |SELECT doc_id, lang, s_en, s_es, s_de, s_fr,
       | CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |      WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |      WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS predicted_lang,
       | (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END) = lang AS is_match
       |FROM s""".stripMargin
  }

  private val aCleaning: Map[String, String] = Map(
    "clean_events" ->
      """SELECT event_id, user_id, upper(trim(event_type)) AS event_type, value,
        | CAST(ts AS DATE) AS event_date, CAST(hour(ts) AS INT) AS event_hour
        |FROM events
        |WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  AND value >= 0.0 AND value <= 400.0""".stripMargin,

    "parse_timestamps" -> parseTimestampsSql,

    "price_clean" -> priceCleanSql,

    "null_profile" -> {
      val cols = Seq("o_orderkey", "price_raw", "price")
      val sums = cols
        .map(c => s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS n_$c")
        .mkString(", ")
      val union = cols
        .map(c => s"SELECT '$c' AS column_name, n_rows, CAST(n_$c AS BIGINT) AS n_null FROM a")
        .mkString(" UNION ALL ")
      s"""WITH pc AS ($priceCleanSql),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, $sums FROM pc)
         |SELECT column_name, n_rows, n_null,
         | CAST((n_null * 1000000) // n_rows AS BIGINT) AS null_micro
         |FROM ($union)""".stripMargin
    },

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
        | ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "fact_lineitem" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
        | CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS ship_date_key,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INT)
        |   AS days_to_ship,
        | ROUND(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2))
        |   - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE), 4) AS revenue,
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
        | o_custkey,
        | ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_price
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
        | ROUND(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS min_price,
        | ROUND(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS max_price,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2)
        |   AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "revenue_by_nation_segment" ->
      """SELECT n_name AS nation, COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
        | COUNT(*) AS n_orders,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
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

    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |   AS sum_base_price,
        | ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2))
        |   - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE), 4)
        |   AS sum_disc_price,
        | ROUND(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2))
        |   - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
        |   * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(18,6)) AS DOUBLE), 6)
        |   AS sum_charge,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2)
        |   AS avg_qty,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2)
        |   AS avg_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "shipping_priority" ->
      """SELECT l_orderkey, order_date, o_orderpriority,
        | ROUND(CAST(revenue_exact AS DOUBLE), 4) AS revenue
        |FROM (
        | SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2))
        |    - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue_exact
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_shipdate > TIMESTAMP '1998-06-01'
        |   AND o_orderdate < TIMESTAMP '1998-06-01'
        |   AND EXISTS (SELECT 1 FROM customer
        |     WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
        | GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        | ORDER BY revenue_exact DESC, l_orderkey LIMIT 10)""".stripMargin,

    "local_supplier_volume" ->
      """SELECT n_name AS nation,
        | ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2))
        |   - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE), 4) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'AMERICA')
        |GROUP BY n_name""".stripMargin,

    "quality_report" ->
      """SELECT * FROM
        |(SELECT COUNT(*) AS o_rows,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |  CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate
        | FROM orders),
        |(SELECT COUNT(*) AS l_rows,
        |  CAST(SUM(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_qty,
        |  CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
        |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate
        | FROM lineitem)""".stripMargin,

    "correlation_density" ->
      """WITH per_nation AS (
        | SELECT c_nationkey,
        |  COUNT(DISTINCT c_custkey) AS x, COUNT(DISTINCT o_orderkey) AS y
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_nationkey),
        |s AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(SUM(x * y) AS BIGINT) AS sxy,
        |  CAST(SUM(x * x) AS BIGINT) AS sxx,
        |  CAST(SUM(y * y) AS BIGINT) AS syy FROM per_nation)
        |SELECT n,
        | ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |  AS pearson_r
        |FROM s""".stripMargin,

    "stddev_order_value" ->
      """SELECT r_name AS region, COUNT(*) AS n,
        | ROUND(sqrt((CAST(COUNT(*) AS DOUBLE)
        |   * CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |       * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DECIMAL(38,4)) AS DOUBLE)
        |   - CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
        |     * CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE))
        |  / (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) - 1 AS DOUBLE))), 4) AS stddev_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "median_order_value" ->
      """WITH priced AS (
        | SELECT r_name AS region, CAST(o_totalprice AS DECIMAL(18,2)) AS x, o_orderkey
        | FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |ranked AS (SELECT *,
        |  row_number() OVER (PARTITION BY region ORDER BY x, o_orderkey) AS rn,
        |  COUNT(*) OVER (PARTITION BY region) AS cnt
        | FROM priced)
        |SELECT region,
        | ROUND(CAST(CAST(SUM(x) AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*), 2) AS median_price
        |FROM ranked
        |WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |GROUP BY region""".stripMargin,

    "weekly_retention" ->
      """WITH weeks AS (
        | SELECT user_id,
        |  CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT)
        |    AS week
        | FROM events),
        |cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id),
        |dw AS (SELECT DISTINCT user_id, week FROM weeks)
        |SELECT cohort_week, dw.week - cohort_week AS week_offset,
        | COUNT(DISTINCT dw.user_id) AS n_users
        |FROM dw JOIN cohorts ON dw.user_id = cohorts.user_id
        |GROUP BY cohort_week, dw.week - cohort_week""".stripMargin,

    "disjunctive_promo_revenue" ->
      """SELECT COUNT(*) AS n_lines,
        | ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |   AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,

    "idle_rich_customers" ->
      """WITH a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |  / COUNT(*) AS avg_bal FROM customer WHERE c_acctbal > 0.0)
        |SELECT n_name AS nation, COUNT(*) AS n_customers,
        | ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
        |   AS total_acctbal
        |FROM customer, a
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > a.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY n_name""".stripMargin,

    "returned_item_customers" ->
      """SELECT c_custkey, c_name, n_name AS nation,
        | COUNT(*) AS n_return_lines,
        | ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |   AS DECIMAL(18,4))) AS DOUBLE), 4) AS returned_revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1999-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY returned_revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "small_qty_revenue" ->
      """WITH bl AS (
        | SELECT l_partkey, l_quantity, l_extendedprice
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand = 'Brand#23'),
        |pp AS (SELECT l_partkey AS t_partkey,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq, COUNT(*) AS cnt
        | FROM bl GROUP BY l_partkey)
        |SELECT COUNT(*) AS n_lines,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   / CAST(7.0 AS DOUBLE), 4) AS avg_yearly
        |FROM bl JOIN pp ON l_partkey = t_partkey
        |WHERE l_quantity < CAST(0.2 AS DOUBLE) * (CAST(sq AS DOUBLE) / cnt)""".stripMargin,

    "large_order_customers" ->
      """WITH big AS (
        | SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        | FROM lineitem GROUP BY l_orderkey
        | HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        | ROUND(CAST(sq AS DOUBLE), 2) AS sum_qty
        |FROM orders
        | JOIN big ON o_orderkey = l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin,

    "volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INT) AS l_year, COUNT(*) AS n_lines,
        | ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |   AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_3', 'NATION_7')
        |  AND cn.n_name IN ('NATION_3', 'NATION_7')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY sn.n_name, cn.n_name, CAST(year(l_shipdate) AS INT)""".stripMargin,

    "product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        | COUNT(*) AS n_lines,
        | ROUND(CAST(SUM(
        |   CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |     * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |     AS DECIMAL(18,4))
        |   - CAST(CAST(p_retailprice AS DECIMAL(18,2))
        |     * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))
        | ) AS DOUBLE), 4) AS profit
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, CAST(year(o_orderdate) AS INT)""".stripMargin,

    "discount_revenue_delta" ->
      """SELECT COUNT(*) AS n_lines,
        | ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE), 4)
        |   AS forecast_delta
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "market_share" ->
      """WITH market_cust AS (
        | SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA'),
        |supp AS (SELECT s_suppkey, n_name AS supp_nation
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        |rev AS (
        | SELECT CAST(year(o_orderdate) AS INT) AS o_year, supp_nation,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |   AS DECIMAL(18,4)) AS r
        | FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supp ON l_suppkey = s_suppkey
        | WHERE o_custkey IN (SELECT c_custkey FROM market_cust))
        |SELECT o_year,
        | ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN r
        |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(SUM(r) AS DOUBLE), 6) AS mkt_share,
        | ROUND(CAST(SUM(r) AS DOUBLE), 2) AS total_revenue
        |FROM rev GROUP BY o_year""".stripMargin,

    "promo_revenue_pct" ->
      """SELECT COUNT(*) AS n_lines,
        | ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(18,4))
        |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
        |  / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'""".stripMargin,

    "top_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |   AS DECIMAL(18,4))) AS rev_exact
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |   AND l_shipdate < TIMESTAMP '1999-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        | ROUND(CAST(rev_exact AS DOUBLE), 4) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_exact = (SELECT MAX(rev_exact) FROM rev)""".stripMargin,

    "sole_late_supplier" ->
      """WITH j AS (
        | SELECT l_orderkey, l_suppkey,
        |  (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'),
        |per_order AS (
        | SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp,
        |  MIN(CASE WHEN late THEN l_suppkey END) AS late_supp
        | FROM j GROUP BY l_orderkey),
        |blamed AS (
        | SELECT late_supp, CAST(COUNT(*) AS BIGINT) AS n_waits
        | FROM per_order WHERE n_supp >= 2 AND n_late_supp = 1
        | GROUP BY late_supp)
        |SELECT s_name, n_name AS nation, n_waits
        |FROM blamed
        | JOIN supplier ON late_supp = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_waits DESC, s_name LIMIT 20""".stripMargin,

    "min_cost_supplier" ->
      """WITH regional_supp AS (
        | SELECT s_suppkey, s_name, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'EUROPE'),
        |ps AS (
        | SELECT l_partkey, l_suppkey,
        |  (CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    * 10000)
        |   // CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT)
        |   AS unit_cost_micro
        | FROM lineitem GROUP BY l_partkey, l_suppkey),
        |j AS (
        | SELECT p_partkey, p_brand, s_name, n_name AS nation, unit_cost_micro,
        |  MIN(unit_cost_micro) OVER (PARTITION BY l_partkey) AS min_cost
        | FROM ps
        |  JOIN part ON l_partkey = p_partkey AND p_size = 15
        |  JOIN regional_supp ON l_suppkey = s_suppkey)
        |SELECT p_partkey, p_brand, s_name, nation, unit_cost_micro
        |FROM j WHERE unit_cost_micro = min_cost""".stripMargin,

    "important_parts" ->
      """WITH per_part AS (
        | SELECT n_name AS nation, l_partkey,
        |  SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)))
        |   AS part_value_exact
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        | GROUP BY n_name, l_partkey),
        |per_nation AS (
        | SELECT nation AS nt, SUM(part_value_exact) AS nation_value,
        |  COUNT(*) AS n_parts
        | FROM per_part GROUP BY nation)
        |SELECT nation, l_partkey,
        | ROUND(CAST(part_value_exact AS DOUBLE), 2) AS part_value,
        | ROUND(CAST(part_value_exact AS DOUBLE)
        |  / CAST(nation_value AS DOUBLE), 6) AS value_share
        |FROM per_part JOIN per_nation ON nation = nt
        |WHERE part_value_exact * n_parts >= nation_value * 4""".stripMargin,

    "part_supplier_counts" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (
        | SELECT l_partkey, l_suppkey FROM pairs
        | WHERE l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size,
        | CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ok JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY p_brand, p_type, p_size""".stripMargin,

    "hourly_anomalies" ->
      """WITH hourly AS (
        | SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS n_events
        | FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type AS et, COUNT(*) AS n_hours,
        |  CAST(SUM(n_events) AS BIGINT) AS sx,
        |  CAST(SUM(n_events * n_events) AS BIGINT) AS sxx
        | FROM hourly GROUP BY event_type),
        |jn AS (
        | SELECT hour_start, event_type, n_events,
        |  CAST(sx AS DOUBLE) / n_hours AS mean,
        |  CAST(sxx AS DOUBLE) / n_hours
        |    - (CAST(sx AS DOUBLE) / n_hours) * (CAST(sx AS DOUBLE) / n_hours)
        |    AS variance
        | FROM hourly JOIN stats ON event_type = et)
        |SELECT hour_start, event_type, n_events, mean_events, z FROM (
        | SELECT hour_start, event_type, n_events,
        |  ROUND(mean, 4) AS mean_events,
        |  ROUND((CAST(n_events AS DOUBLE) - mean) / sqrt(variance), 4) AS z
        | FROM jn WHERE variance > 0)
        |WHERE abs(z) >= 2.0""".stripMargin,

    "customer_sample_by_nation" ->
      """SELECT n_name AS nation, COUNT(*) AS n_customers,
        | array_to_string(list_slice(list(c_name ORDER BY c_name), 1, 5), ',')
        |   AS sample_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "late_shipment_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "customer_order_distribution" ->
      """SELECT n_orders, COUNT(*) AS n_customers FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey)
        |GROUP BY n_orders""".stripMargin,

    // quartiles on the per-segment DISTINCT-DOLLAR CDF desc (ties share
    // a quartile), matching the scale-safe cdfBuckets decomposition
    "customer_spend_quartiles" ->
      """WITH s AS (
        | SELECT o_custkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM orders GROUP BY o_custkey),
        |j AS (
        | SELECT c_custkey, c_mktsegment, cents, cents // 100 AS dollars
        | FROM customer JOIN s ON c_custkey = o_custkey),
        |v AS (SELECT c_mktsegment, dollars, COUNT(*) AS n FROM j GROUP BY 1, 2),
        |c AS (SELECT *,
        |  SUM(n) OVER (PARTITION BY c_mktsegment ORDER BY dollars DESC) AS cum,
        |  SUM(n) OVER (PARTITION BY c_mktsegment) AS nd
        | FROM v),
        |b AS (SELECT c_mktsegment, dollars,
        |  CAST(((cum - n) * 4) // nd + 1 AS INT) AS spend_quartile
        | FROM c)
        |SELECT c_custkey, j.c_mktsegment,
        | round(cents / 100.0, 2) AS spend, spend_quartile
        |FROM j JOIN b ON j.c_mktsegment = b.c_mktsegment
        | AND j.dollars = b.dollars""".stripMargin,

    // sketch columns are tolerance-band booleans: the oracle asserts the
    // estimates landed in-band (TRUE); exact columns compare directly
    "approx_distincts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        | COUNT(*) AS n_lines,
        | TRUE AS approx_parts_ok,
        | TRUE AS approx_median_rank_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "pct_fast_fulfillment" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        | CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |   CAST(l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
        | ROUND(CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |   CAST(l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END) AS DOUBLE)
        |   * CAST(100.0 AS DOUBLE) / COUNT(*), 2) AS pct_fast
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "late_priority_mix" ->
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_linestatus""".stripMargin,

    "excess_share_suppliers" ->
      """WITH qty AS (
        | SELECT l_partkey, l_suppkey,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        | FROM lineitem
        | WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        | GROUP BY 1, 2),
        |w AS (SELECT l_suppkey, sq,
        |  CAST(SUM(sq) OVER (PARTITION BY l_partkey) AS BIGINT) AS total_q
        | FROM qty),
        |m AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_majority_parts
        | FROM w WHERE sq * 8 > total_q GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name AS nation, n_majority_parts
        |FROM m JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey""".stripMargin,

    "basket_affinity" ->
      """WITH ot AS (
        | SELECT DISTINCT l_orderkey, p_type
        | FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ot),
        |tc AS (SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ot GROUP BY 1),
        |pairs AS (
        | SELECT a.p_type AS type_a, b.p_type AS type_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_both
        | FROM ot a JOIN ot b
        |  ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
        | GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        | ta.n_t AS n_a, tb.n_t AS n_b,
        | CAST((n_both::HUGEINT * n_orders * 1000000) // (ta.n_t::HUGEINT * tb.n_t)
        |   AS BIGINT) AS lift_micro
        |FROM pairs
        | JOIN tc ta ON type_a = ta.p_type
        | JOIN tc tb ON type_b = tb.p_type
        | CROSS JOIN n""".stripMargin,

    "seasonality_index" ->
      """WITH m AS (
        | SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS revenue_cents
        | FROM orders GROUP BY 1),
        |w AS (SELECT *, CAST(SUM(revenue_cents) OVER () AS BIGINT) AS total FROM m)
        |SELECT month, revenue_cents,
        | CAST((revenue_cents::HUGEINT * 12000000) // total AS BIGINT) AS index_micro
        |FROM w""".stripMargin,

    "fk_orphans" -> {
      def orphanLeg(name: String, child: String, fk: String,
          parent: String, pk: String): String =
        s"""SELECT '$name' AS relationship, 'fk_orphan' AS audit,
           | CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_rows,
           | COUNT(*) AS n_keys
           |FROM (SELECT $fk AS k, COUNT(*) AS cnt FROM $child
           |      WHERE $fk IS NOT NULL GROUP BY 1) c
           |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p ON c.k = p.k
           |WHERE p.k IS NULL""".stripMargin
      def unrefLeg(name: String, child: String, fk: String,
          parent: String, pk: String): String =
        s"""SELECT '$name' AS relationship, 'unreferenced_parent' AS audit,
           | COUNT(*) AS n_rows, COUNT(*) AS n_keys
           |FROM (SELECT DISTINCT $pk AS k FROM $parent) p
           |LEFT JOIN (SELECT DISTINCT $fk AS k FROM $child
           |           WHERE $fk IS NOT NULL) c ON p.k = c.k
           |WHERE c.k IS NULL""".stripMargin
      val edges = Seq(
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      edges.flatMap { case (n, c, fk, p, pk) =>
        Seq(orphanLeg(n, c, fk, p, pk), unrefLeg(n, c, fk, p, pk))
      }.mkString("\nUNION ALL\n")
    },

    "benford_audit" -> {
      val expCase = graft.operators.AuditOps.benfordExpMicro
        .map { case (d, m) => s"WHEN $d THEN $m" }.mkString(" ")
      s"""WITH obs AS (
         | SELECT 'o_totalprice' AS src_col,
         |  CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
         |    1, 1) AS INT) AS digit,
         |  COUNT(*) AS n_obs
         | FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1, 2
         | UNION ALL
         | SELECT 'l_extendedprice' AS src_col,
         |  CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
         |    1, 1) AS INT) AS digit,
         |  COUNT(*) AS n_obs
         | FROM lineitem WHERE l_extendedprice >= 1.0 GROUP BY 1, 2),
         |t AS (SELECT *, SUM(n_obs) OVER (PARTITION BY src_col) AS total
         |      FROM obs),
         |m AS (SELECT src_col, CAST(digit AS BIGINT) AS digit, n_obs,
         |  CAST((n_obs * 1000000) // total AS BIGINT) AS obs_micro,
         |  CAST(CASE digit $expCase END AS BIGINT) AS exp_micro
         | FROM t)
         |SELECT *, abs(obs_micro - exp_micro) AS dev_micro FROM m""".stripMargin
    },

    "hll_merge_audit" ->
      """SELECT event_type,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_users,
        | TRUE AS hll_within_5pct
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // the KMV estimator is exact integer arithmetic on md5-prefix
    // hashes, so the oracle reproduces the ESTIMATES, not just bands
    "kmv_intersection" ->
      """WITH u AS (
        | SELECT DISTINCT event_type, user_id FROM events
        | WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')),
        |hh AS (SELECT event_type,
        |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        | FROM u),
        |r AS (SELECT event_type, h,
        |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS r FROM hh),
        |sk AS (SELECT event_type, h FROM r WHERE r <= 64),
        |uk AS (SELECT h FROM (
        |  SELECT h, row_number() OVER (ORDER BY h) AS r
        |  FROM (SELECT DISTINCT h FROM sk)) WHERE r <= 64),
        |us AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union_hashes,
        |  MAX(h) AS hk FROM uk),
        |ib AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM uk
        | JOIN (SELECT h FROM sk WHERE event_type = 'view') a USING (h)
        | JOIN (SELECT h FROM sk WHERE event_type = 'purchase') b USING (h)),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
        |  CAST(SUM(v * p) AS BIGINT) AS exact_intersection FROM (
        |  SELECT user_id,
        |   MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')
        |  GROUP BY user_id)),
        |e1 AS (SELECT *,
        |  CASE WHEN n_union_hashes < 64 THEN exact_union
        |   ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
        |     // CAST(hk AS HUGEINT) AS BIGINT) END AS est_union
        | FROM ex CROSS JOIN us CROSS JOIN ib),
        |e2 AS (SELECT *,
        |  CASE WHEN n_union_hashes < 64 THEN exact_intersection
        |   ELSE CAST((CAST(n_both AS HUGEINT) * est_union) // 64 AS BIGINT)
        |  END AS est_intersection
        | FROM e1)
        |SELECT CAST(64 AS BIGINT) AS k, est_union, exact_union,
        | est_intersection, exact_intersection,
        | n_both AS n_sketch_overlap,
        | abs(est_union - exact_union) * 100 <= exact_union * 40
        |   AS union_within_40pct,
        | abs(est_intersection - exact_intersection) * 100
        |   <= exact_intersection * 40 AS intersection_within_40pct
        |FROM e2""".stripMargin,

    "robust_price_stats" ->
      """WITH cdf AS (
        | SELECT o_orderpriority AS grp,
        |  CAST(floor(o_totalprice) AS BIGINT) AS usd,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM orders GROUP BY 1, 2),
        |c AS (SELECT grp, usd, n,
        |  SUM(n) OVER (PARTITION BY grp ORDER BY usd) AS cum,
        |  SUM(n) OVER (PARTITION BY grp) AS total FROM cdf),
        |med AS (SELECT grp, MIN(usd) AS median_usd FROM c
        | WHERE cum * 2 >= total GROUP BY grp),
        |p5 AS (SELECT grp, MIN(usd) AS p5_usd FROM c
        | WHERE cum * 20 >= total GROUP BY grp),
        |p95 AS (SELECT grp, MIN(usd) AS p95_usd FROM c
        | WHERE cum * 20 >= total * 19 GROUP BY grp),
        |dev AS (SELECT c.grp, abs(usd - median_usd) AS dev,
        |  CAST(SUM(n) AS BIGINT) AS n
        | FROM c JOIN med ON c.grp = med.grp GROUP BY 1, 2),
        |d2 AS (SELECT grp, dev, n,
        |  SUM(n) OVER (PARTITION BY grp ORDER BY dev) AS cum,
        |  SUM(n) OVER (PARTITION BY grp) AS total FROM dev),
        |mad AS (SELECT grp, MIN(dev) AS mad_usd FROM d2
        | WHERE cum * 2 >= total GROUP BY grp),
        |win AS (SELECT c.grp, CAST(SUM(n) AS BIGINT) AS n_orders,
        |  SUM(CAST(LEAST(GREATEST(usd, p5_usd), p95_usd) AS HUGEINT) * n) AS s
        | FROM c JOIN p5 ON c.grp = p5.grp JOIN p95 ON c.grp = p95.grp
        | GROUP BY 1)
        |SELECT win.grp AS o_orderpriority, n_orders, median_usd, mad_usd,
        | p5_usd, p95_usd,
        | ROUND(CAST(s AS DOUBLE) / n_orders, 2) AS winsor_mean_usd
        |FROM win JOIN med ON win.grp = med.grp
        | JOIN mad ON win.grp = mad.grp
        | JOIN p5 ON win.grp = p5.grp JOIN p95 ON win.grp = p95.grp""".stripMargin,

    "equi_depth_histogram" ->
      """WITH v AS (
        | SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |        COUNT(*) AS cnt
        | FROM orders GROUP BY 1),
        |c AS (
        | SELECT cents, cnt,
        |        SUM(cnt) OVER (ORDER BY cents) AS cum,
        |        SUM(cnt) OVER () AS total
        | FROM v)
        |SELECT CAST(((cum - cnt) * 8) // total + 1 AS INT) AS bucket,
        |       round(MIN(cents) / 100.0, 2) AS lo_price,
        |       round(MAX(cents) / 100.0, 2) AS hi_price,
        |       CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |       COUNT(*) AS n_values
        |FROM c GROUP BY 1""".stripMargin,

    "rfm_segments" ->
      """WITH cust AS (
        | SELECT o_custkey,
        |        MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |        COUNT(*) AS freq,
        |        SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        | FROM orders GROUP BY 1),
        |mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
        |base AS (
        | SELECT o_custkey, CAST(date_diff('day', last_d, max_d) AS BIGINT) AS rec_days,
        |        freq, cents
        | FROM cust CROSS JOIN mx),
        |tr AS (
        | SELECT MIN(CASE WHEN cum >= (n * 33 + 99) // 100 THEN v END) AS t33,
        |        MIN(CASE WHEN cum >= (n * 66 + 99) // 100 THEN v END) AS t66
        | FROM (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n
        |       FROM (SELECT rec_days AS v, COUNT(*) AS cnt FROM base GROUP BY 1))),
        |tf AS (
        | SELECT MIN(CASE WHEN cum >= (n * 33 + 99) // 100 THEN v END) AS t33,
        |        MIN(CASE WHEN cum >= (n * 66 + 99) // 100 THEN v END) AS t66
        | FROM (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n
        |       FROM (SELECT freq AS v, COUNT(*) AS cnt FROM base GROUP BY 1))),
        |tm AS (
        | SELECT MIN(CASE WHEN cum >= (n * 33 + 99) // 100 THEN v END) AS t33,
        |        MIN(CASE WHEN cum >= (n * 66 + 99) // 100 THEN v END) AS t66
        | FROM (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n
        |       FROM (SELECT cents // 100 AS v, COUNT(*) AS cnt FROM base GROUP BY 1))),
        |scored AS (
        | SELECT b.*,
        |  CASE WHEN rec_days <= tr.t33 THEN 3 WHEN rec_days <= tr.t66 THEN 2 ELSE 1 END AS r,
        |  CASE WHEN freq <= tf.t33 THEN 1 WHEN freq <= tf.t66 THEN 2 ELSE 3 END AS f,
        |  CASE WHEN cents // 100 <= tm.t33 THEN 1 WHEN cents // 100 <= tm.t66 THEN 2 ELSE 3 END AS m
        | FROM base b, tr, tf, tm)
        |SELECT CASE
        |   WHEN r = 3 AND f = 3 AND m = 3 THEN 'champion'
        |   WHEN r = 3 AND f >= 2 THEN 'loyal'
        |   WHEN r >= 2 AND m = 3 THEN 'big_spender'
        |   WHEN r = 1 AND f >= 2 THEN 'at_risk'
        |   WHEN r = 1 THEN 'hibernating'
        |   ELSE 'regular' END AS segment,
        | COUNT(*) AS n_customers,
        | CAST(SUM(rec_days) AS BIGINT) AS sum_rec_days,
        | CAST(SUM(freq) AS BIGINT) AS sum_orders,
        | round(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS total_spend
        |FROM scored GROUP BY 1""".stripMargin,

    // deciles on the DISTINCT dollar-quantized spend CDF desc (the
    // distinct table is price-domain-bounded; revenue stays exact cents)
    "spend_decile_lift" ->
      """WITH spend AS (
        | SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        | FROM orders GROUP BY 1),
        |v AS (SELECT cents // 100 AS dollars, COUNT(*) AS cnt,
        |        SUM(cents::HUGEINT) AS grp_cents
        |      FROM spend GROUP BY 1),
        |c AS (
        | SELECT dollars, cnt, grp_cents,
        |        SUM(cnt) OVER (ORDER BY dollars DESC) AS cum,
        |        SUM(cnt) OVER () AS n
        | FROM v),
        |d AS (
        | SELECT CAST(((cum - cnt) * 10) // n + 1 AS INT) AS decile,
        |        CAST(SUM(cnt) AS BIGINT) AS n_customers,
        |        SUM(grp_cents) AS rev_cents
        | FROM c GROUP BY 1)
        |SELECT decile, n_customers,
        | round(CAST(rev_cents AS DOUBLE) / 100.0, 2) AS revenue,
        | CAST((rev_cents * 1000000) // SUM(rev_cents) OVER () AS BIGINT) AS rev_share_micro,
        | CAST((rev_cents * SUM(n_customers) OVER () * 1000000) //
        |      (n_customers::HUGEINT * SUM(rev_cents) OVER ()) AS BIGINT) AS lift_micro
        |FROM d""".stripMargin,

    "partition_stats" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        | COUNT(*) AS n_rows,
        | CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
        | CAST(MAX(l_quantity) AS BIGINT) AS max_qty,
        | round(MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS min_price,
        | round(MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS max_price,
        | CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
        | CAST(MAX(l_shipdate) AS DATE) AS max_shipdate,
        | CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty
        |FROM lineitem GROUP BY 1""".stripMargin,

    "quantile_sketch_audit" ->
      """WITH v AS (
        | SELECT o_orderpriority,
        |  CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
        | FROM orders),
        |g AS (SELECT o_orderpriority, cents, COUNT(*) AS n
        |      FROM v GROUP BY 1, 2),
        |rk AS (SELECT *,
        |  SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  SUM(n) OVER (PARTITION BY o_orderpriority) AS total
        | FROM g)
        |SELECT o_orderpriority, CAST(MAX(total) AS BIGINT) AS n_rows,
        | ROUND(MIN(CASE WHEN cum >= (total * 50 + 99) // 100
        |   THEN cents END) / 100.0, 2) AS exact_p50,
        | ROUND(MIN(CASE WHEN cum >= (total * 90 + 99) // 100
        |   THEN cents END) / 100.0, 2) AS exact_p90,
        | TRUE AS ok_p50, TRUE AS ok_p90
        |FROM rk GROUP BY 1""".stripMargin,

    "token_budget_alloc" -> {
      val norm = normTextSql("text")
      s"""WITH d AS (
         | SELECT lang, source,
         |  CASE WHEN length($norm) = 0 THEN 0
         |       ELSE len(string_split($norm, ' ')) END AS toks
         | FROM documents),
         |s AS (SELECT lang, source, CAST(SUM(toks) AS BIGINT) AS avail_tokens
         |      FROM d GROUP BY 1, 2),
         |t AS (SELECT *, SUM(avail_tokens) OVER () AS total FROM s),
         |b AS (SELECT *,
         |  CAST((CAST(1000000 AS HUGEINT) * avail_tokens) // total AS BIGINT)
         |    AS base,
         |  CAST((CAST(1000000 AS HUGEINT) * avail_tokens) % total AS BIGINT)
         |    AS rem
         | FROM t),
         |r AS (SELECT *,
         |  ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rr,
         |  1000000 - SUM(base) OVER () AS leftover FROM b)
         |SELECT lang, source, avail_tokens,
         | CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
         |   AS alloc_tokens
         |FROM r""".stripMargin
    },

    "rolling_anomaly_flags" ->
      """WITH c AS (
        | SELECT event_id, event_type, ts,
        |  CAST(floor(value * 100.0) AS BIGINT) AS value_cents
        | FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |w AS (
        | SELECT event_id, event_type, value_cents,
        |  COUNT(value_cents) OVER pre AS n_prior,
        |  COALESCE(SUM(CAST(value_cents AS HUGEINT)) OVER pre, 0) AS s,
        |  COALESCE(SUM(CAST(value_cents AS HUGEINT) * value_cents) OVER pre,
        |    0) AS q
        | FROM c
        | WINDOW pre AS (PARTITION BY event_type ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, value_cents, n_prior,
        | n_prior >= 30 AND
        |  (value_cents * n_prior - s) * (value_cents * n_prior - s) >
        |  9 * (n_prior * q - s * s) AS is_anomaly
        |FROM w""".stripMargin,

    "name_fuzzy_pairs" ->
      """WITH n AS (
        | SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name
        | FROM customer),
        |pos AS (
        | SELECT id, name, unnest(range(1, length(name) + 1)) AS i FROM n),
        |keys AS (
        | SELECT DISTINCT id, name, k FROM (
        |  SELECT id, name, name AS k FROM n
        |  UNION ALL
        |  SELECT id, name,
        |   substr(name, 1, CAST(i AS INT) - 1) ||
        |   substr(name, CAST(i AS INT) + 1, length(name)) AS k
        |  FROM pos)),
        |cand AS (
        | SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |  a.name AS name_a, b.name AS name_b
        | FROM keys a JOIN keys b ON a.k = b.k AND a.id < b.id)
        |SELECT id_a, id_b, name_a, name_b,
        | CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(name_a, name_b) <= 1""".stripMargin,

    "new_vs_returning" ->
      """WITH o AS (
        | SELECT o_custkey,
        |  CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS p
        | FROM orders),
        |f AS (SELECT *, MIN(ym) OVER (PARTITION BY o_custkey) AS first_ym FROM o),
        |g AS (
        | SELECT ym,
        |  CAST(SUM(CASE WHEN ym = first_ym THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN ym <> first_ym THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returning,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN ym = first_ym THEN p END),
        |    0) AS DOUBLE), 2) AS new_revenue,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN ym <> first_ym THEN p END),
        |    0) AS DOUBLE), 2) AS returning_revenue
        | FROM f GROUP BY ym)
        |SELECT ym, n_new, n_returning, new_revenue, returning_revenue,
        | CAST((n_new * 1000000) // (n_new + n_returning) AS BIGINT)
        |   AS new_share_micro
        |FROM g""".stripMargin,

    "category_growth" ->
      """WITH y AS (
        | SELECT p_type, CAST(year(l_shipdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(18,4))) * 10000 AS BIGINT) AS r4
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY 1, 2),
        |l AS (SELECT *,
        |  lag(r4) OVER (PARTITION BY p_type ORDER BY yr) AS prev_r4,
        |  lag(yr) OVER (PARTITION BY p_type ORDER BY yr) AS prev_yr
        | FROM y)
        |SELECT p_type, yr, ROUND(r4 / 10000.0, 2) AS revenue,
        | CASE WHEN prev_yr = yr - 1 AND prev_r4 > 0
        |  THEN CAST((r4::HUGEINT * 1000000) // prev_r4 AS BIGINT) END
        |   AS yoy_growth_micro
        |FROM l""".stripMargin,

    "cohort_ltv" ->
      """WITH o AS (
        | SELECT o_custkey,
        |  CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS BIGINT) AS qidx,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS p
        | FROM orders),
        |w AS (SELECT *, MIN(qidx) OVER (PARTITION BY o_custkey) AS cqidx FROM o),
        |g AS (
        | SELECT cqidx, qidx - cqidx AS quarter_offset,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
        |  CAST(SUM(p) * 100 AS BIGINT) AS revenue_cents
        | FROM w GROUP BY 1, 2)
        |SELECT
        | CAST(cqidx // 4 AS VARCHAR) || '-Q' || CAST(cqidx % 4 + 1 AS VARCHAR)
        |   AS cohort_quarter,
        | CAST(quarter_offset AS BIGINT) AS quarter_offset, n_active, revenue_cents,
        | CAST(SUM(revenue_cents) OVER (PARTITION BY cqidx ORDER BY quarter_offset
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
        |FROM g""".stripMargin,

    "weekday_hour_heatmap" ->
      """SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow,
        | CAST(hour(ts) AS BIGINT) AS hour_of_day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "customer_rfm_segments" ->
      """WITH ref AS (SELECT MAX(o_orderdate) AS ref_date FROM orders),
        |per AS (
        | SELECT o_custkey, MAX(o_orderdate) AS last_order,
        |  CAST(COUNT(*) AS BIGINT) AS frequency,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        | FROM orders GROUP BY o_custkey),
        |s AS (
        | SELECT o_custkey,
        |  CAST(date_diff('day', CAST(last_order AS DATE),
        |    CAST(ref_date AS DATE)) AS BIGINT) AS recency_days,
        |  frequency,
        |  CAST(spend * 100 AS BIGINT) AS monetary_cents
        | FROM per CROSS JOIN ref)
        |SELECT o_custkey, recency_days, frequency, monetary_cents,
        | CAST(CASE WHEN recency_days <= 365 THEN 3
        |      WHEN recency_days <= 1095 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
        | CAST(CASE WHEN frequency >= 15 THEN 3
        |      WHEN frequency >= 8 THEN 2 ELSE 1 END AS BIGINT) AS f_score,
        | CAST(CASE WHEN monetary_cents >= 300000000 THEN 3
        |      WHEN monetary_cents >= 150000000 THEN 2 ELSE 1 END AS BIGINT) AS m_score,
        | CAST(CASE WHEN recency_days <= 365 THEN 3
        |      WHEN recency_days <= 1095 THEN 2 ELSE 1 END AS VARCHAR) ||
        | CAST(CASE WHEN frequency >= 15 THEN 3
        |      WHEN frequency >= 8 THEN 2 ELSE 1 END AS VARCHAR) ||
        | CAST(CASE WHEN monetary_cents >= 300000000 THEN 3
        |      WHEN monetary_cents >= 150000000 THEN 2 ELSE 1 END AS VARCHAR)
        |   AS segment
        |FROM s""".stripMargin,

    "order_value_deciles" ->
      """WITH v AS (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS p FROM orders),
        |b AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY p),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM v),
        |c AS (SELECT p, n,
        |  CAST(SUM(n) OVER (ORDER BY p
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |  nd
        | FROM b CROSS JOIN nd)
        |SELECT CAST(((cum_n - n) * 10) // nd + 1 AS BIGINT) AS decile,
        | CAST(SUM(n) AS BIGINT) AS n_orders,
        | CAST(MIN(p) AS BIGINT) AS min_dollars,
        | CAST(MAX(p) AS BIGINT) AS max_dollars
        |FROM c GROUP BY 1""".stripMargin,

    "nation_supplier_hhi" ->
      """WITH ps AS (
        | SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        | FROM lineitem GROUP BY l_suppkey),
        |j AS (
        | SELECT n_name, sq,
        |  CAST(SUM(sq) OVER (PARTITION BY n_name) AS BIGINT) AS tot
        | FROM ps
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |s AS (SELECT n_name, (sq * 1000000) // tot AS share_micro FROM j)
        |SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        | CAST(CAST(SUM(share_micro * share_micro) AS BIGINT) // 1000000 AS BIGINT)
        |   AS hhi_micro
        |FROM s GROUP BY n_name""".stripMargin,

    "nation_top_order_values" ->
      """WITH j AS (
        | SELECT n_name AS nation,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents
        | FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |r AS (SELECT nation, value_cents,
        |  CAST(row_number() OVER (PARTITION BY nation
        |    ORDER BY value_cents DESC) AS BIGINT) AS rank
        | FROM j)
        |SELECT nation, rank, value_cents FROM r WHERE rank <= 3""".stripMargin,

    "order_gap_stats" ->
      """WITH w AS (
        | SELECT o_custkey, o_orderdate,
        |  LAG(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev_date
        | FROM orders),
        |g AS (
        | SELECT o_custkey,
        |  CAST(date_diff('day', CAST(prev_date AS DATE),
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        | FROM w WHERE prev_date IS NOT NULL)
        |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        | CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
        | CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
        | CAST((CAST(SUM(gap_days) AS BIGINT) * 1000000) // COUNT(*) AS BIGINT)
        |   AS avg_gap_micro_days
        |FROM g GROUP BY o_custkey""".stripMargin,

    "snapshot_diff" ->
      """WITH base AS (
        | SELECT o_orderkey, o_orderstatus,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
        | FROM orders),
        |old AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
        |neu AS (
        | SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 3 = 0 THEN (price_cents * 110) // 100
        |       ELSE price_cents END AS price_cents
        | FROM base WHERE o_orderkey % 5 <> 0)
        |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        | CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |      WHEN n.o_orderkey IS NULL THEN 'delete'
        |      ELSE 'update' END AS change_type,
        | o.o_orderstatus AS old_status, n.o_orderstatus AS new_status,
        | ROUND(o.price_cents / 100.0, 2) AS old_price,
        | ROUND(n.price_cents / 100.0, 2) AS new_price
        |FROM old o FULL OUTER JOIN neu n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |  OR o.o_orderstatus <> n.o_orderstatus
        |  OR o.price_cents <> n.price_cents""".stripMargin,

    "table_fingerprint" ->
      """WITH oh AS (
        | SELECT ('0x'||substr(md5(concat_ws('|', o_orderkey, o_custkey,
        |   o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |   CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)),
        |   1, 15))::BIGINT AS h
        | FROM orders),
        |lh AS (
        | SELECT ('0x'||substr(md5(concat_ws('|', l_orderkey, l_partkey,
        |   l_suppkey, l_linenumber, CAST(l_quantity AS BIGINT),
        |   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
        |   l_returnflag, l_linestatus,
        |   CAST(CAST(l_shipdate AS DATE) AS VARCHAR))), 1, 15))::BIGINT AS h
        | FROM lineitem),
        |ch AS (
        | SELECT ('0x'||substr(md5(concat_ws('|', c_custkey, c_name,
        |   c_nationkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
        |   c_mktsegment)), 1, 15))::BIGINT AS h
        | FROM customer)
        |SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
        | bit_xor(h) AS xor_fp,
        | CAST(SUM(CAST(h AS HUGEINT)) % 1000000000000000000 AS BIGINT) AS sum_fp
        |FROM oh
        |UNION ALL
        |SELECT 'lineitem', COUNT(*), bit_xor(h),
        | CAST(SUM(CAST(h AS HUGEINT)) % 1000000000000000000 AS BIGINT)
        |FROM lh
        |UNION ALL
        |SELECT 'customer', COUNT(*), bit_xor(h),
        | CAST(SUM(CAST(h AS HUGEINT)) % 1000000000000000000 AS BIGINT)
        |FROM ch""".stripMargin,

    "ols_revenue_trend" ->
      """WITH m AS (
        | SELECT r_name AS region,
        |  CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS t,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y_cents
        | FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        | GROUP BY 1, 2),
        |s AS (
        | SELECT region, CAST(COUNT(*) AS HUGEINT) AS n,
        |  CAST(SUM(t) AS HUGEINT) AS st, CAST(SUM(t*t) AS HUGEINT) AS stt,
        |  CAST(SUM(y_cents) AS HUGEINT) AS sy,
        |  CAST(SUM(t*y_cents) AS HUGEINT) AS sty
        | FROM m GROUP BY region)
        |SELECT region, CAST(n AS BIGINT) AS n_months,
        | ROUND(CAST(n*sty - st*sy AS DOUBLE) /
        |       CAST(n*stt - st*st AS DOUBLE), 4) AS slope_cents_per_month,
        | ROUND(CAST(sy*stt - st*sty AS DOUBLE) /
        |       CAST(n*stt - st*st AS DOUBLE), 2) AS intercept_cents,
        | ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 2) AS mean_monthly_cents
        |FROM s""".stripMargin,

    // the dyadic Holt weights are hard-coded LITERALS derived by an
    // independent exact-fraction recurrence (NOT imported from
    // TrendOps.holtWeights — a shared weight table would let one bug
    // reproduce identically in both engines and pass verification):
    //   l_i = (y_i + l_{i-1} + b_{i-1})/2, b_i = ((l_i − l_{i-1}) + b_{i-1})/2,
    //   l_0 = y_0, b_0 = 0, α = β = ½ → after 7 steps every weight is an
    //   integer multiple of 1/16384. Σlw = 16384 (level weights sum to 1).
    "holt_forecast" -> {
      val lw = Seq(-1254L, -914L, -744L, -32L, 1408L, 3584L, 6144L, 8192L)
      val bw = Seq(287L, -627L, -1084L, -1456L, -1472L, -768L, 1024L, 4096L)
      val den = 16384L
      def dot(ws: Seq[Long]) =
        ws.zipWithIndex.map { case (wt, j) => s"($wt * y$j)" }.mkString(" + ")
      val lagCols = (0 to 7)
        .map(j => s"lag(cents, ${7 - j}) OVER w AS y$j").mkString(", ")
      val notNull = (0 to 7).map(j => s"y$j IS NOT NULL").mkString(" AND ")
      val scale = s"${den * 100}.0"
      s"""WITH daily AS (
         | SELECT CAST(o_orderdate AS DATE) AS d,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
         | FROM orders GROUP BY 1),
         |lg AS (SELECT d, cents, $lagCols
         | FROM daily WINDOW w AS (ORDER BY d))
         |SELECT d, ROUND(cents / 100.0, 2) AS revenue,
         | ROUND((${dot(lw)}) / $scale, 2) AS holt_level,
         | ROUND((${dot(bw)}) / $scale, 2) AS holt_trend,
         | ROUND(((${dot(lw)}) + (${dot(bw)})) / $scale, 2) AS forecast_next,
         | ROUND(((${dot(lw)}) + 7 * (${dot(bw)})) / $scale, 2) AS forecast_7d
         |FROM lg WHERE $notNull""".stripMargin
    },

    "acf_daily_revenue" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
        | FROM orders GROUP BY 1),
        |lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 8)),
        |p AS (
        | SELECT l.lag, a.y AS x, b.y AS y2
        | FROM daily a CROSS JOIN lags l
        | JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)),
        |s AS (
        | SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
        |  CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y2) AS HUGEINT) AS sy,
        |  CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |  CAST(SUM(CAST(y2 AS HUGEINT) * y2) AS HUGEINT) AS syy,
        |  CAST(SUM(CAST(x AS HUGEINT) * y2) AS HUGEINT) AS sxy
        | FROM p GROUP BY lag)
        |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
        | CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0
        |       AND CAST(n*syy - sy*sy AS DOUBLE) > 0
        |  THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE) /
        |   sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
        |        CAST(n*syy - sy*sy AS DOUBLE)), 4) END AS acf
        |FROM s""".stripMargin,

    "order_backlog_timeline" ->
      """WITH opens AS (
        | SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(COUNT(*) AS BIGINT) AS n_opened
        | FROM orders GROUP BY 1),
        |lastship AS (
        | SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS d
        | FROM lineitem GROUP BY l_orderkey),
        |closes AS (
        | SELECT d, CAST(COUNT(*) AS BIGINT) AS n_closed
        | FROM lastship GROUP BY d),
        |tl AS (
        | SELECT COALESCE(o.d, c.d) AS d,
        |  COALESCE(o.n_opened, 0) AS n_opened,
        |  COALESCE(c.n_closed, 0) AS n_closed
        | FROM opens o FULL OUTER JOIN closes c ON o.d = c.d)
        |SELECT d, n_opened, n_closed,
        | CAST(SUM(n_opened - n_closed) OVER (ORDER BY d
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS open_backlog
        |FROM tl""".stripMargin,

    "segment_migration_matrix" ->
      """WITH yearly AS (
        | SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        | FROM orders GROUP BY 1, 2),
        |t AS (
        | SELECT o_custkey, y,
        |  CASE WHEN cents < 35000000 THEN 'LOW'
        |       WHEN cents < 60000000 THEN 'MID' ELSE 'HIGH' END AS tier
        | FROM yearly),
        |led AS (
        | SELECT o_custkey, y, tier,
        |  LEAD(y) OVER (PARTITION BY o_custkey ORDER BY y) AS next_y,
        |  LEAD(tier) OVER (PARTITION BY o_custkey ORDER BY y) AS next_tier
        | FROM t),
        |mx AS (SELECT MAX(y) AS max_y FROM t)
        |SELECT y AS year, tier AS src_tier,
        | CASE WHEN next_y = y + 1 THEN next_tier ELSE 'CHURNED' END AS dst_tier,
        | CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM led, mx WHERE y < max_y
        |GROUP BY 1, 2, 3""".stripMargin,

    "windowed_conversion" ->
      """WITH su AS (
        | SELECT user_id, MIN(ts) AS s_ts FROM events
        | WHERE event_type = 'signup' GROUP BY user_id),
        |fp AS (
        | SELECT e.user_id, MIN(e.ts) AS p_ts
        | FROM events e JOIN su ON e.user_id = su.user_id
        | WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
        | GROUP BY e.user_id),
        |c AS (
        | SELECT CAST(date_trunc('week', su.s_ts) AS DATE) AS signup_week,
        |  CASE WHEN fp.p_ts <= su.s_ts + INTERVAL 7 DAY THEN 1 ELSE 0 END
        |    AS converted
        | FROM su LEFT JOIN fp ON su.user_id = fp.user_id)
        |SELECT signup_week, CAST(COUNT(*) AS BIGINT) AS n_signups,
        | CAST(SUM(converted) AS BIGINT) AS n_converted,
        | (CAST(SUM(converted) AS BIGINT) * 1000000) // COUNT(*)
        |   AS conversion_micro
        |FROM c GROUP BY signup_week""".stripMargin,

    "shipping_sla_percentiles" ->
      """WITH d AS (
        | SELECT o_orderpriority,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE)) AS BIGINT) AS days
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |v AS (SELECT o_orderpriority, days, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM d GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority, days, n,
        |  SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  SUM(n) OVER (PARTITION BY o_orderpriority) AS total
        | FROM v)
        |SELECT o_orderpriority,
        | MIN(CASE WHEN cum * 100 >= total * 50 THEN days END) AS p50,
        | MIN(CASE WHEN cum * 100 >= total * 90 THEN days END) AS p90,
        | MIN(CASE WHEN cum * 100 >= total * 99 THEN days END) AS p99,
        | CAST(MAX(total) AS BIGINT) AS n_lines
        |FROM r GROUP BY o_orderpriority""".stripMargin,

    "mixture_temperature" ->
      s"""WITH t AS (SELECT lang,
         |  CAST(CASE WHEN length(${normTextSql("text")}) = 0 THEN 0
         |       ELSE len(string_split(${normTextSql("text")}, ' ')) END AS BIGINT) AS n
         | FROM documents),
         |g AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
         |w AS (SELECT lang, n_tokens,
         |  CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s1 FROM g),
         |c AS (SELECT lang, n_tokens,
         |  CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN s1 + 1
         |       WHEN s1 * s1 > n_tokens THEN s1 - 1
         |       ELSE s1 END AS weight FROM w)
         |SELECT lang, n_tokens, weight,
         | CAST((weight * 1000000) // (SUM(weight) OVER ()) AS BIGINT)
         |   AS share_micro,
         | CAST((n_tokens * 1000000) // (SUM(n_tokens) OVER ()) AS BIGINT)
         |   AS natural_share_micro
         |FROM c""".stripMargin,

    // PipelineOps.mixtureResample: the temperature mixture EXECUTED —
    // per-language acceptance micro threshold (exact integer, HUGEINT
    // internals) decided per doc by the shared salted md5 hash
    "mixture_resample" ->
      s"""WITH t AS (SELECT lang,
         |  CAST(CASE WHEN length(${normTextSql("text")}) = 0 THEN 0
         |       ELSE len(string_split(${normTextSql("text")}, ' ')) END AS BIGINT) AS n
         | FROM documents),
         |g AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
         |w AS (SELECT lang, n_tokens,
         |  CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s1 FROM g),
         |c AS (SELECT lang, n_tokens,
         |  CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN s1 + 1
         |       WHEN s1 * s1 > n_tokens THEN s1 - 1
         |       ELSE s1 END AS weight FROM w),
         |a AS (SELECT lang,
         |  CAST(LEAST(1000000,
         |    (weight::HUGEINT * (SUM(n_tokens) OVER ()) * 1000000) //
         |    (n_tokens::HUGEINT * (SUM(weight) OVER ()))) AS BIGINT)
         |    AS accept_micro
         | FROM c WHERE n_tokens > 0)
         |SELECT doc_id, d.lang, source, accept_micro
         |FROM documents d JOIN a ON d.lang = a.lang
         |WHERE ${hash32Sql(
             s"'${graft.operators.PipelineOps.MixSalt}' || CAST(doc_id AS VARCHAR)")}
         |  % 1000000 < accept_micro""".stripMargin,

    // PipelineOps.mixtureUpsample: the repeat-factor leg — per-language
    // temperature ratio (capped ×4) split into whole copies + a
    // fractional copy decided by the SAME salted hash as the resample;
    // copies materialize through a bounded generate_series join
    "mixture_upsample" ->
      s"""WITH t AS (SELECT lang,
         |  CAST(CASE WHEN length(${normTextSql("text")}) = 0 THEN 0
         |       ELSE len(string_split(${normTextSql("text")}, ' ')) END AS BIGINT) AS n
         | FROM documents),
         |g AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
         |w AS (SELECT lang, n_tokens,
         |  CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s1 FROM g),
         |c AS (SELECT lang, n_tokens,
         |  CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN s1 + 1
         |       WHEN s1 * s1 > n_tokens THEN s1 - 1
         |       ELSE s1 END AS weight FROM w),
         |r AS (SELECT lang,
         |  CAST(LEAST(4::HUGEINT * 1000000,
         |    (weight::HUGEINT * (SUM(n_tokens) OVER ()) * 1000000) //
         |    (n_tokens::HUGEINT * (SUM(weight) OVER ()))) AS BIGINT)
         |    AS ratio_micro
         | FROM c WHERE n_tokens > 0),
         |nc AS (SELECT doc_id, d.lang, source,
         |  ratio_micro // 1000000 +
         |  CASE WHEN ${hash32Sql(
             s"'${graft.operators.PipelineOps.MixSalt}' || CAST(doc_id AS VARCHAR)")}
         |    % 1000000 < ratio_micro % 1000000 THEN 1 ELSE 0 END AS n_copies
         | FROM documents d JOIN r ON d.lang = r.lang)
         |SELECT doc_id, lang, source, CAST(s.copy AS BIGINT) AS copy_id,
         | CAST(n_copies AS BIGINT) AS n_copies
         |FROM nc JOIN (SELECT unnest(generate_series(1, 4)) AS copy) s
         |  ON s.copy <= nc.n_copies""".stripMargin,

    "embed_outliers" ->
      """WITH clean AS (
        | SELECT vec_id, label, embedding FROM embeddings
        | WHERE embedding IS NOT NULL
        |  AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)))) = 0),
        |q AS (
        | SELECT vec_id, label, CAST(d.dim AS BIGINT) AS dim,
        |  CAST(TRUNC(embedding[d.dim]::DOUBLE * 1000000) AS BIGINT) AS micro
        | FROM clean, (SELECT unnest(generate_series(1, 64)) AS dim) d),
        |st AS (
        | SELECT label, dim, COUNT(*) AS n, SUM(CAST(micro AS HUGEINT)) AS s
        | FROM q GROUP BY label, dim),
        |dev AS (
        | SELECT q.label, q.vec_id,
        |  SUM((CAST(q.micro AS HUGEINT) * n - s) * (CAST(q.micro AS HUGEINT) * n - s))
        |    AS dev2,
        |  MAX(n) AS n
        | FROM q JOIN st ON q.label = st.label AND q.dim = st.dim
        | GROUP BY q.label, q.vec_id),
        |r AS (
        | SELECT label, vec_id, dev2, n, CAST(row_number() OVER (
        |   PARTITION BY label ORDER BY dev2 DESC, vec_id) AS BIGINT) AS rank
        | FROM dev)
        |SELECT label, vec_id, rank,
        | ROUND(CAST(dev2 AS DOUBLE) /
        |   CAST(CAST(n * n AS HUGEINT) * 1000000000000 AS DOUBLE), 6)
        |   AS outlier_score
        |FROM r WHERE rank <= 20""".stripMargin,

    "embed_dim_stats" ->
      """WITH e AS (
        | SELECT label, d.dim AS dim,
        |  CAST(TRUNC(embedding[d.dim]::DOUBLE * 1000000) AS BIGINT) AS micro
        | FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS dim) d
        | WHERE embedding IS NOT NULL AND NOT isnan(embedding[d.dim]::DOUBLE))
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        | CAST(COUNT(*) AS BIGINT) AS n_vecs,
        | CAST(SUM(CAST(micro AS HUGEINT)) AS BIGINT) AS sum_micro,
        | ROUND(CAST(SUM(CAST(micro AS HUGEINT)) AS DOUBLE) / COUNT(*), 2)
        |   AS mean_micro
        |FROM e GROUP BY label, dim""".stripMargin,

    // the skyline oracle is the single-window strict-prefix-max form —
    // Spark's two-level bucket factorization computes the same predicate
    "price_qty_skyline" ->
      """WITH r AS (
        | SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS price_cents,
        |  CAST(l_quantity AS BIGINT) AS qty
        | FROM lineitem),
        |w AS (
        | SELECT *, MAX(qty) OVER (ORDER BY price_cents
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mq
        | FROM r)
        |SELECT l_orderkey, l_linenumber,
        | ROUND(price_cents / 100.0, 2) AS price, qty
        |FROM w WHERE mq IS NULL OR mq <= qty""".stripMargin,

    "supplier_abc_classes" ->
      """WITH s AS (
        | SELECT l_suppkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS revenue_cents
        | FROM lineitem GROUP BY l_suppkey),
        |c AS (
        | SELECT l_suppkey, revenue_cents,
        |  SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, l_suppkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
        |  SUM(revenue_cents) OVER () AS total_cents
        | FROM s)
        |SELECT l_suppkey, ROUND(revenue_cents / 100.0, 2) AS revenue,
        | CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
        |      WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
        |      ELSE 'C' END AS abc_class
        |FROM c""".stripMargin,

    // the CMS booleans are deterministic guarantees — the oracle checks
    // the exact counts and asserts the bands hold (approx_distincts
    // pattern)
    "cms_event_type_freq" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        | TRUE AS cms_no_undercount, TRUE AS cms_within_band
        |FROM events GROUP BY event_type""".stripMargin,

    "trade_triangles" ->
      """WITH ls AS (
        | SELECT DISTINCT l_orderkey, n_name AS src
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |os AS (
        | SELECT o_orderkey, n_name AS dst
        | FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |e AS (SELECT DISTINCT src, dst FROM ls JOIN os ON l_orderkey = o_orderkey
        |      WHERE src <> dst),
        |cyc AS (
        | SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        | FROM e e1
        |  JOIN e e2 ON e1.dst = e2.src
        |  JOIN e e3 ON e2.dst = e3.src AND e3.dst = e1.src
        | WHERE e1.src < e1.dst AND e1.src < e2.dst),
        |p AS (SELECT a AS nation FROM cyc
        |      UNION ALL SELECT b FROM cyc
        |      UNION ALL SELECT c FROM cyc)
        |SELECT n_name AS nation, CAST(COALESCE(cnt, 0) AS BIGINT) AS n_cycles
        |FROM nation LEFT JOIN (
        |  SELECT nation, COUNT(*) AS cnt FROM p GROUP BY nation) q
        | ON n_name = q.nation""".stripMargin,

    "nation_trade_pagerank" -> {
      // the same integer recurrence unrolled as a CTE chain: it0 = 10⁶//N,
      // it_{k+1} = 15·10⁴//N + (85·Σ_{u→v} it_k(u)//outdeg(u)) // 100
      def iter(k: Int): String =
        s"""it$k AS (
           | SELECT n.nation, b.base + (85 * COALESCE(c.in_sum, 0)) // 100 AS r
           | FROM nodes n
           | CROSS JOIN (SELECT 150000 // n_nodes AS base FROM nn) b
           | LEFT JOIN (
           |   SELECT e.dst, SUM(p.r // e.outdeg) AS in_sum
           |   FROM e JOIN it${k - 1} p ON e.src = p.nation
           |   GROUP BY e.dst) c ON n.nation = c.dst)"""
      """WITH ls AS (
        | SELECT DISTINCT l_orderkey, n_name AS src
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |os AS (
        | SELECT o_orderkey, n_name AS dst
        | FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |e0 AS (SELECT DISTINCT src, dst FROM ls JOIN os ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS outdeg FROM e0),
        |nodes AS (SELECT n_name AS nation FROM nation),
        |nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
        |it0 AS (SELECT nation, 1000000 // n_nodes AS r FROM nodes, nn),""" +
        (1 to 5).map(iter).mkString(",") + """
        |SELECT nation, CAST(r AS BIGINT) AS rank_micro FROM it5"""
    }.stripMargin,

    // GraphOps.nationTradeHits: 3 sum-normalized HITS rounds over the
    // same edge CTEs — a_k from h_{k-1} in-sums, h_k from a_k out-sums,
    // each L1-normalized to 10⁶ with the identical integer div.
    "nation_trade_hits" -> {
      // every chained CTE is AS MATERIALIZED and totals are their own
      // CTEs — a double-referenced round CTE (normalizer total + join)
      // otherwise re-inlines the whole upstream chain exponentially
      // (measured: sf0.001 never finishes without it)
      def aStep(k: Int): String =
        s"""ar$k AS MATERIALIZED (SELECT e.dst, SUM(p.h) AS raw
           | FROM e0 e JOIN h${k - 1} p ON e.src = p.nation GROUP BY e.dst),
           |at$k AS (SELECT SUM(raw) AS tot FROM ar$k),
           |a$k AS MATERIALIZED (SELECT n.nation,
           |  CAST((COALESCE(c.raw, 0) * 1000000)
           |    // NULLIF(t.tot, 0) AS BIGINT) AS a
           | FROM nodes n LEFT JOIN ar$k c ON n.nation = c.dst
           | CROSS JOIN at$k t)"""
      def hStep(k: Int): String =
        s"""hr$k AS MATERIALIZED (SELECT e.src, SUM(p.a) AS raw
           | FROM e0 e JOIN a$k p ON e.dst = p.nation GROUP BY e.src),
           |ht$k AS (SELECT SUM(raw) AS tot FROM hr$k),
           |h$k AS MATERIALIZED (SELECT n.nation,
           |  CAST((COALESCE(c.raw, 0) * 1000000)
           |    // NULLIF(t.tot, 0) AS BIGINT) AS h
           | FROM nodes n LEFT JOIN hr$k c ON n.nation = c.src
           | CROSS JOIN ht$k t)"""
      """WITH ls AS (
        | SELECT DISTINCT l_orderkey, n_name AS src
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |os AS (
        | SELECT o_orderkey, n_name AS dst
        | FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |e0 AS MATERIALIZED (
        | SELECT DISTINCT src, dst FROM ls JOIN os ON l_orderkey = o_orderkey),
        |nodes AS (SELECT n_name AS nation FROM nation),
        |h0 AS (SELECT nation, 1000000 AS h FROM nodes),""" +
        (1 to 3).map(k => aStep(k) + ",\n" + hStep(k)).mkString(",\n") + """
        |SELECT h3.nation, CAST(h3.h AS BIGINT) AS hub_micro,
        | CAST(a3.a AS BIGINT) AS auth_micro
        |FROM h3 JOIN a3 ON h3.nation = a3.nation"""
    }.stripMargin,

    // bloom_segment_revenue routes through BloomOps.bloomPrunedJoin —
    // the bloom is physical-only, so the oracle is the PLAIN join
    "bloom_segment_revenue" ->
      """SELECT o_orderpriority,
        | CAST(COUNT(*) AS BIGINT) AS n_orders,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |   AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority""".stripMargin,

    "daily_gapfill" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
        |             MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
        |spine AS (
        | SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        | FROM b),
        |j AS (
        | SELECT s.d, daily.n_orders, daily.cents,
        |  CASE WHEN daily.n_orders > 0 THEN daily.cents // daily.n_orders END
        |    AS avg_cents
        | FROM spine s LEFT JOIN daily ON s.d = daily.d)
        |SELECT d, COALESCE(n_orders, 0) AS n_orders,
        | ROUND(COALESCE(cents, 0) / 100.0, 2) AS revenue,
        | ROUND((last_value(avg_cents IGNORE NULLS) OVER (ORDER BY d
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) / 100.0, 2)
        |   AS avg_order_value_ffill
        |FROM j""".stripMargin,

    "ewma_daily_revenue" -> {
      val num = (0 until 8)
        .map(k => s"COALESCE(LAG(cents, $k) OVER (ORDER BY d) * ${1L << (7 - k)}, 0)")
        .mkString(" + ")
      val den = (0 until 8)
        .map(k => s"(CASE WHEN LAG(cents, $k) OVER (ORDER BY d) IS NOT NULL THEN ${1L << (7 - k)} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH daily AS (
         | SELECT CAST(o_orderdate AS DATE) AS d,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
         | FROM orders GROUP BY 1)
         |SELECT d, n_orders, ROUND(cents / 100.0, 2) AS revenue,
         | ROUND(($num) / ($den) / 100.0, 2) AS ewma_revenue
         |FROM daily""".stripMargin
    },

    "changepoint_cusum" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |c AS (
        | SELECT d, cents,
        |  CAST(row_number() OVER (ORDER BY d) AS HUGEINT) AS t,
        |  SUM(CAST(cents AS HUGEINT)) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
        |    AS prefix,
        |  CAST(COUNT(*) OVER () AS HUGEINT) AS n,
        |  SUM(CAST(cents AS HUGEINT)) OVER () AS s
        | FROM daily),
        |r AS (SELECT d, cents, n, n * prefix - t * s AS cusum FROM c),
        |k AS (SELECT *, CAST(row_number() OVER (
        |  ORDER BY abs(cusum) DESC, d) AS BIGINT) AS rnk FROM r)
        |SELECT d, rnk, ROUND(cents / 100.0, 2) AS revenue,
        | ROUND(CAST(cusum AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 2)
        |   AS cusum_dollars
        |FROM k WHERE rnk <= 10""".stripMargin,

    "revenue_streaks" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |f AS (
        | SELECT d, cents, CAST(COUNT(*) OVER () AS HUGEINT) AS n,
        |  SUM(CAST(cents AS HUGEINT)) OVER () AS s
        | FROM daily),
        |ab AS (SELECT d, cents FROM f WHERE CAST(cents AS HUGEINT) * n > s),
        |isl AS (SELECT d, cents,
        |  d - CAST(row_number() OVER (ORDER BY d) AS INTEGER) AS island FROM ab),
        |st AS (SELECT island, MIN(d) AS streak_start, MAX(d) AS streak_end,
        |  COUNT(*) AS n_days, SUM(CAST(cents AS HUGEINT)) AS cents
        | FROM isl GROUP BY island),
        |k AS (SELECT *, CAST(row_number() OVER (
        |  ORDER BY n_days DESC, streak_start) AS BIGINT) AS rnk FROM st)
        |SELECT streak_start, streak_end, n_days, rnk,
        | ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue
        |FROM k WHERE rnk <= 10""".stripMargin,

    "rolling_distinct_users" ->
      """WITH e AS (
        | SELECT CAST(ts AS DATE) AS d, user_id FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |days AS (SELECT DISTINCT d AS day FROM e)
        |SELECT day AS d,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_users,
        | TRUE AS hll_within_5pct
        |FROM e JOIN days ON e.d >= day - 6 AND e.d <= day
        |GROUP BY day""".stripMargin,

    // exact-integer BM25 surrogate (odds-ratio idf, fractions cleared);
    // constants are k1=6/5, b=3/4 folded: (k1n+k1d)*bd=44, k1d*bd=20,
    // k1n*(bd-bn)=6, k1n*bn=18 — mirror TextOps.bm25Search's defaults
    "bm25_search" ->
      s"""WITH docs AS (
         | SELECT doc_id, string_split(${normTextSql("text")}, ' ') AS ts
         | FROM documents WHERE length(${normTextSql("text")}) > 0),
         |dd AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, ts FROM docs),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dd),
         |tf AS (
         | SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
         | FROM (SELECT doc_id, dl, unnest(ts) AS t FROM dd)
         | WHERE t IN (${graft.operators.TextOps.Bm25Terms.map(t => s"'$t'").mkString(", ")})
         | GROUP BY 1, 2),
         |dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (
         | SELECT doc_id,
         |  CAST(SUM(CAST(
         |    (CAST(2 * (n_docs - df) + 1 AS HUGEINT) * (44 * tf) * sum_dl
         |      * 1000000) //
         |    (CAST(2 * df + 1 AS HUGEINT) *
         |      ((20 * tf) * sum_dl + 6 * sum_dl + 18 * dl * n_docs))
         |   AS BIGINT)) AS BIGINT) AS score_micro,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms_hit
         | FROM tf JOIN dfc USING (term), stats GROUP BY doc_id)
         |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT)
         |   AS rank, doc_id, score_micro, n_terms_hit
         |FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    // the k-means recurrence unrolled: seeds = 8 lowest vec_ids, two
    // assignment rounds with one floor-mean centroid recompute between —
    // all-integer micro-unit distances, ties to the lowest centroid id
    "embed_kmeans" ->
      """WITH p AS (
        | SELECT vec_id, CAST(d.dim AS BIGINT) AS dim,
        |  CAST(TRUNC(embedding[d.dim]::DOUBLE * 1000000) AS BIGINT) AS p
        | FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS dim) d
        | WHERE embedding IS NOT NULL
        |  AND len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)))) = 0),
        |c0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, dim, p AS c
        |       FROM p WHERE vec_id < 8),
        |d0 AS (SELECT p.vec_id, c0.cid,
        |         SUM((p.p - c0.c) * (p.p - c0.c)) AS d2
        |       FROM p JOIN c0 USING (dim) GROUP BY 1, 2),
        |a0 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid, row_number() OVER (
        |           PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d0)
        |       WHERE rn = 1),
        |c1 AS (SELECT cid, dim,
        |         CAST(FLOOR(CAST(SUM(p.p) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        |       FROM p JOIN a0 USING (vec_id) GROUP BY 1, 2),
        |d1 AS (SELECT p.vec_id, c1.cid,
        |         SUM((p.p - c1.c) * (p.p - c1.c)) AS d2
        |       FROM p JOIN c1 USING (dim) GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid, d2 FROM (
        |         SELECT vec_id, cid, d2, row_number() OVER (
        |           PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d1)
        |       WHERE rn = 1)
        |SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        | ROUND(CAST(SUM(CAST(d2 AS HUGEINT)) AS DOUBLE) / COUNT(*)
        |   / 1000000000000.0, 6) AS mean_sqdist
        |FROM a1 GROUP BY cid""".stripMargin,

    // three unrolled BPE rounds over the ␟-wrapped symbol encoding —
    // the encode side: re-derive the same 3 merges (CTE chain identical
    // to bpe_learn_merges), then apply them to EVERY word of every doc
    // as a chain of scalar-subquery replaces; COALESCE to chr(30) (never
    // present) keeps a missing merge a no-op, mirroring the Spark fold
    // over however many merges were actually learned
    "bpe_encode" -> {
      def pc(w: String) =
        s"""SELECT ts[i] AS lhs, ts[i+1] AS rhs, SUM(n) AS c
           | FROM (SELECT string_split(trim(s, chr(31)), chr(31) || chr(31)) AS ts, n
           |       FROM $w) q,
           |  unnest(generate_series(1, len(ts) - 1)) AS u(i)
           | WHERE len(ts) >= 2 GROUP BY 1, 2""".stripMargin
      def mrg(w: String, t: String) =
        s"""SELECT replace(s, chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
           |   chr(31) || lhs || rhs || chr(31)) AS s, n FROM $w, $t""".stripMargin
      def pat(t: String) =
        s"""COALESCE((SELECT chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31)
           |  FROM $t), chr(30))""".stripMargin
      def rep(t: String) =
        s"COALESCE((SELECT chr(31) || lhs || rhs || chr(31) FROM $t), chr(30))"
      s"""WITH w AS (
         | SELECT unnest(string_split(${norm("text")}, ' ')) AS word
         | FROM documents WHERE length(${norm("text")}) > 0),
         |wc AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
         |w0 AS (SELECT regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS s, n
         |       FROM wc WHERE length(word) >= 2),
         |pc0 AS (${pc("w0")}),
         |t1 AS (SELECT lhs, rhs, c FROM pc0 ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w1 AS (${mrg("w0", "t1")}),
         |pc1 AS (${pc("w1")}),
         |t2 AS (SELECT lhs, rhs, c FROM pc1 ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w2 AS (${mrg("w1", "t2")}),
         |pc2 AS (${pc("w2")}),
         |t3 AS (SELECT lhs, rhs, c FROM pc2 ORDER BY c DESC, lhs, rhs LIMIT 1),
         |docw AS (
         | SELECT doc_id, unnest(string_split(${norm("text")}, ' ')) AS word
         | FROM documents WHERE length(${norm("text")}) > 0),
         |enc AS (
         | SELECT doc_id,
         |  replace(replace(replace(
         |    regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g'),
         |    ${pat("t1")}, ${rep("t1")}),
         |    ${pat("t2")}, ${rep("t2")}),
         |    ${pat("t3")}, ${rep("t3")}) AS s
         | FROM docw)
         |SELECT doc_id,
         | CAST(COUNT(*) AS BIGINT) AS n_words,
         | CAST(SUM(len(string_split(trim(s, chr(31)), chr(31) || chr(31)))) AS BIGINT)
         |   AS n_bpe_tokens,
         | CAST((SUM(len(string_split(trim(s, chr(31)), chr(31) || chr(31)))) * 1000000)
         |   // COUNT(*) AS BIGINT) AS fertility_micro
         |FROM enc GROUP BY doc_id""".stripMargin
    },

    // replace() is left-to-right non-overlapping in both engines, which
    // is exactly the BPE merge rule (see TextOps.bpeLearnMerges)
    "bpe_learn_merges" -> {
      def pc(w: String) =
        s"""SELECT ts[i] AS lhs, ts[i+1] AS rhs, SUM(n) AS c
           | FROM (SELECT string_split(trim(s, chr(31)), chr(31) || chr(31)) AS ts, n
           |       FROM $w) q,
           |  unnest(generate_series(1, len(ts) - 1)) AS u(i)
           | WHERE len(ts) >= 2 GROUP BY 1, 2""".stripMargin
      def mrg(w: String, t: String) =
        s"""SELECT replace(s, chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
           |   chr(31) || lhs || rhs || chr(31)) AS s, n FROM $w, $t""".stripMargin
      s"""WITH w AS (
         | SELECT unnest(string_split(${norm("text")}, ' ')) AS word
         | FROM documents WHERE length(${norm("text")}) > 0),
         |wc AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
         |w0 AS (SELECT regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS s, n
         |       FROM wc WHERE length(word) >= 2),
         |pc0 AS (${pc("w0")}),
         |t1 AS (SELECT lhs, rhs, c FROM pc0 ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w1 AS (${mrg("w0", "t1")}),
         |pc1 AS (${pc("w1")}),
         |t2 AS (SELECT lhs, rhs, c FROM pc1 ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w2 AS (${mrg("w1", "t2")}),
         |pc2 AS (${pc("w2")}),
         |t3 AS (SELECT lhs, rhs, c FROM pc2 ORDER BY c DESC, lhs, rhs LIMIT 1)
         |SELECT CAST(1 AS BIGINT) AS merge_rank, lhs, rhs,
         |  CAST(c AS BIGINT) AS pair_count FROM t1
         |UNION ALL SELECT 2, lhs, rhs, CAST(c AS BIGINT) FROM t2
         |UNION ALL SELECT 3, lhs, rhs, CAST(c AS BIGINT) FROM t3""".stripMargin
    },

    "join_size_estimate" -> {
      def edge(i: Int, name: String, l: String, lk: String,
          r: String, rk: String) =
        s"""l$i AS (SELECT CAST($lk AS BIGINT) AS k, COUNT(*) AS cl
           |  FROM $l WHERE $lk IS NOT NULL GROUP BY 1),
           |r$i AS (SELECT CAST($rk AS BIGINT) AS k, COUNT(*) AS cr
           |  FROM $r WHERE $rk IS NOT NULL GROUP BY 1),
           |e$i AS (
           | SELECT '$name' AS join_key,
           |  CAST(n_left AS BIGINT) AS n_left,
           |  CAST(n_right AS BIGINT) AS n_right,
           |  CAST(ndv_left AS BIGINT) AS ndv_left,
           |  CAST(ndv_right AS BIGINT) AS ndv_right,
           |  CAST(est AS BIGINT) AS est_rows,
           |  CAST(exact_rows AS BIGINT) AS exact_rows,
           |  CAST(CASE WHEN est >= exact_rows
           |    THEN ((est - exact_rows) * 1000000) // exact_rows
           |    ELSE -(((exact_rows - est) * 1000000) // exact_rows)
           |   END AS BIGINT) AS est_err_micro
           | FROM (SELECT n_left, n_right, ndv_left, ndv_right, exact_rows,
           |   (n_left * n_right) // GREATEST(ndv_left, ndv_right) AS est
           |  FROM (SELECT CAST(SUM(cl) AS HUGEINT) AS n_left,
           |          COUNT(*) AS ndv_left FROM l$i),
           |   (SELECT CAST(SUM(cr) AS HUGEINT) AS n_right,
           |      COUNT(*) AS ndv_right FROM r$i),
           |   (SELECT COALESCE(SUM(CAST(cl AS HUGEINT) * cr), 0) AS exact_rows
           |    FROM l$i JOIN r$i USING (k))))""".stripMargin
      s"""WITH ${edge(1, "orders.o_orderkey=lineitem.l_orderkey",
            "orders", "o_orderkey", "lineitem", "l_orderkey")},
         |${edge(2, "customer.c_custkey=orders.o_custkey",
            "customer", "c_custkey", "orders", "o_custkey")}
         |SELECT * FROM e1 UNION ALL SELECT * FROM e2""".stripMargin
    },

    // AuditOps.statsDrift: per-column stats of a baseline (pre-1997) vs
    // current (1997+) orders snapshot, melted so each snapshot is one
    // scan; null-rate delta in exact integer micro-units.
    "stats_drift" ->
      """WITH proj AS (
        | SELECT o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |  CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS order_day,
        |  o_orderdate < DATE '1997-01-01' AS is_base
        | FROM orders),
        |m AS (
        | SELECT 'o_custkey' AS col_name, CAST(o_custkey AS BIGINT) AS v, is_base FROM proj
        | UNION ALL SELECT 'price_cents', price_cents, is_base FROM proj
        | UNION ALL SELECT 'order_day', order_day, is_base FROM proj),
        |b AS (SELECT col_name, COUNT(*) AS n_base,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_base,
        |  MIN(v) AS min_base, MAX(v) AS max_base
        | FROM m WHERE is_base GROUP BY col_name),
        |c AS (SELECT col_name, COUNT(*) AS n_cur,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_cur,
        |  MIN(v) AS min_cur, MAX(v) AS max_cur
        | FROM m WHERE NOT is_base GROUP BY col_name)
        |SELECT col_name, n_base, n_cur, nulls_base, nulls_cur,
        | min_base, min_cur, max_base, max_cur,
        | (nulls_cur * 1000000) // n_cur - (nulls_base * 1000000) // n_base
        |   AS null_rate_delta_micro,
        | (min_cur < min_base OR max_cur > max_base) AS range_expanded
        |FROM b JOIN c USING (col_name)""".stripMargin,

    // AuditOps.joinPlanAdvisor: per-edge keyspace stats → deterministic
    // strategy pick (broadcast ≤ 2000 rows, right wins ties; salted when
    // either side's hottest·ndv/n skew factor ≥ 10×uniform; else hash).
    "join_plan_advisor" -> {
      def edge(i: Int, name: String, l: String, lk: String,
          r: String, rk: String) =
        s"""ls$i AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_left,
           |  COUNT(*) AS ndv_left, MAX(cnt) AS max_cnt_left
           | FROM (SELECT COUNT(*) AS cnt FROM $l
           |       WHERE $lk IS NOT NULL GROUP BY CAST($lk AS BIGINT))),
           |rs$i AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_right,
           |  COUNT(*) AS ndv_right, MAX(cnt) AS max_cnt_right
           | FROM (SELECT COUNT(*) AS cnt FROM $r
           |       WHERE $rk IS NOT NULL GROUP BY CAST($rk AS BIGINT))),
           |e$i AS (
           | SELECT '$name' AS join_key, n_left, n_right, ndv_left, ndv_right,
           |  max_cnt_left, max_cnt_right,
           |  CAST((CAST(max_cnt_left AS HUGEINT) * ndv_left * 1000000) // n_left
           |    AS BIGINT) AS skew_left_micro,
           |  CAST((CAST(max_cnt_right AS HUGEINT) * ndv_right * 1000000) // n_right
           |    AS BIGINT) AS skew_right_micro
           | FROM ls$i, rs$i)""".stripMargin
      val edges = Seq(
        ("lineitem.l_orderkey=orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey=customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey=nation.n_nationkey",
          "customer", "c_nationkey", "nation", "n_nationkey"),
        ("events.user_id=orders.o_custkey",
          "events", "user_id", "orders", "o_custkey"))
      val ctes = edges.zipWithIndex.map { case ((n, l, lk, r, rk), i) =>
        edge(i + 1, n, l, lk, r, rk)
      }.mkString(",\n")
      val sel = edges.indices.map(i => s"SELECT * FROM e${i + 1}")
        .mkString(" UNION ALL ")
      s"""WITH $ctes,
         |u AS ($sel)
         |SELECT join_key, n_left, n_right, ndv_left, ndv_right,
         | max_cnt_left, max_cnt_right, skew_left_micro, skew_right_micro,
         | CASE WHEN n_right <= 2000 AND n_right <= n_left THEN 'broadcast_right'
         |      WHEN n_left <= 2000 THEN 'broadcast_left'
         |      WHEN skew_left_micro >= 10000000 OR skew_right_micro >= 10000000
         |        THEN 'shuffle_salted'
         |      ELSE 'shuffle_hash' END AS recommended
         |FROM u""".stripMargin
    },

    // three unrolled synchronous LPA rounds; argmax = (count DESC,
    // label ASC) row_number, isolated nodes keep their own label
    "nation_communities" -> {
      def round(k: Int): String =
        s"""nb$k AS (SELECT u, community, COUNT(*) AS c
           |  FROM und JOIN l${k - 1} ON v = nation GROUP BY 1, 2),
           |b$k AS (SELECT u, community FROM (
           |  SELECT u, community, row_number() OVER (
           |    PARTITION BY u ORDER BY c DESC, community) AS rn FROM nb$k)
           |  WHERE rn = 1),
           |l$k AS (SELECT n.nation, COALESCE(b.community, n.nation) AS community
           |  FROM nodes n LEFT JOIN b$k b ON n.nation = b.u)""".stripMargin
      """WITH ls AS (
        | SELECT DISTINCT l_orderkey, n_name AS src
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |os AS (
        | SELECT o_orderkey, n_name AS dst
        | FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |e0 AS (SELECT DISTINCT src, dst FROM ls JOIN os ON l_orderkey = o_orderkey
        |       WHERE src <> dst),
        |und AS (SELECT src AS u, dst AS v FROM e0
        |        UNION SELECT dst, src FROM e0),
        |nodes AS (SELECT n_name AS nation FROM nation),
        |l0 AS (SELECT nation, nation AS community FROM nodes),""" +
        (1 to 3).map(round).mkString(",") + """
        |SELECT nation, community FROM l3"""
    }.stripMargin,

    // quantile_cont semantics re-derived in exact integer math over the
    // distinct-cents CDF (same recurrence as the Spark side; the
    // built-in quantile_cont would drift in float rank arithmetic)
    "order_value_percentiles_cont" -> {
      def interp(p: Int) =
        s"""ROUND(CAST(
           |  MIN(CASE WHEN cum >= ((total - 1) * $p) // 100 + 1 THEN v END)
           |    * (100 - (MAX(total) - 1) * $p % 100)
           |  + MIN(CASE WHEN cum >= LEAST(((total - 1) * $p) // 100 + 2, total)
           |      THEN v END)
           |    * ((MAX(total) - 1) * $p % 100)
           | AS DOUBLE) / 10000.0, 4) AS p$p""".stripMargin
      s"""WITH c AS (
         | SELECT o_orderpriority,
         |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
         | FROM orders),
         |bv AS (SELECT o_orderpriority, v, COUNT(*) AS n
         |       FROM c GROUP BY 1, 2),
         |r AS (SELECT o_orderpriority, v,
         |  SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY v
         |    ROWS UNBOUNDED PRECEDING) AS cum,
         |  SUM(n) OVER (PARTITION BY o_orderpriority) AS total
         | FROM bv)
         |SELECT o_orderpriority, CAST(MAX(total) AS BIGINT) AS n_orders,
         | ${interp(50)}, ${interp(90)}, ${interp(99)}
         |FROM r GROUP BY o_orderpriority""".stripMargin
    },

    // StatOps.theilSenTrend: pairwise integer micro-slopes of daily
    // revenue with a sign branch around the floor division; the median
    // as the two central order statistics via distinct-value-CDF rank
    // probes. HUGEINT stays internal; every output column is BIGINT.
    "theil_sen_trend" ->
      """WITH daily AS (
        | SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
        | FROM orders GROUP BY o_orderdate),
        |slopes AS (
        | SELECT CASE WHEN b.y >= a.y
        |   THEN CAST((CAST(b.y - a.y AS HUGEINT) * 1000000) // (b.t - a.t) AS BIGINT)
        |   ELSE -CAST((CAST(a.y - b.y AS HUGEINT) * 1000000) // (b.t - a.t) AS BIGINT)
        |   END AS s
        | FROM daily a JOIN daily b ON b.t > a.t),
        |tot AS (SELECT COUNT(*) AS m FROM slopes),
        |nd AS (SELECT COUNT(*) AS n_days FROM daily),
        |cum AS (SELECT s, n, SUM(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum
        | FROM (SELECT s, COUNT(*) AS n FROM slopes GROUP BY s)),
        |lo AS (SELECT s AS slope_lo_micro FROM cum, tot
        | WHERE cum - n < (m + 1) // 2 AND (m + 1) // 2 <= cum),
        |hi AS (SELECT s AS slope_hi_micro FROM cum, tot
        | WHERE cum - n < m // 2 + 1 AND m // 2 + 1 <= cum)
        |SELECT n_days, m AS n_pairs, slope_lo_micro, slope_hi_micro,
        | ROUND(CAST(slope_lo_micro + slope_hi_micro AS DOUBLE) / 2.0 / 1000000.0, 4)
        |   AS sen_slope_cents_per_day
        |FROM nd, tot, lo, hi""".stripMargin,

    // StatOps.revenueMotifs: quartile symbols from the distinct-value
    // CDF (OpUtils.cdfBuckets semantics: a tie group lands wholly in its
    // first member's bucket), motifs from two consecutive-day equi-joins.
    "revenue_motifs" ->
      """WITH daily AS (
        | SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
        | FROM orders GROUP BY o_orderdate),
        |byv AS (SELECT y, COUNT(*) AS n FROM daily GROUP BY y),
        |tot AS (SELECT COUNT(*) AS nd FROM daily),
        |buck AS (SELECT y, ((cum_n - n) * 4) // nd + 1 AS bucket FROM (
        |  SELECT y, n, SUM(n) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS cum_n
        |  FROM byv), tot),
        |sym AS (SELECT t, bucket AS q FROM daily JOIN buck USING (y))
        |SELECT CAST(s0.q AS VARCHAR) || CAST(s1.q AS VARCHAR) || CAST(s2.q AS VARCHAR)
        |   AS motif, COUNT(*) AS n_windows
        |FROM sym s0 JOIN sym s1 ON s1.t = s0.t + 1 JOIN sym s2 ON s2.t = s0.t + 2
        |GROUP BY 1""".stripMargin,

    // StatOps.bootstrapCiOrderValue: Poisson(1) weights from the shared
    // inverse-CDF micro thresholds on ONE hash32('bs:'||key) per row,
    // expanded to per-resample uniforms via the (a_r, b_r) universal-
    // hash family (matching the Spark side — never a hash per
    // (key, resample) pair); per-resample means as exact integer micro
    // ratios; CI = rank-4 / rank-61 order statistics of the 64 resample
    // means.
    "bootstrap_ci_order_value" ->
      s"""WITH y AS (SELECT o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
         | FROM orders),
         |pt AS (SELECT COUNT(*) AS n_orders,
         |  CAST((SUM(CAST(y AS HUGEINT)) * 1000000) // COUNT(*) AS BIGINT) AS mean_micro
         | FROM y),
         |hx AS (SELECT y,
         |  ${hash32Sql("'bs:' || CAST(o_orderkey AS VARCHAR)")} AS x FROM y),
         |us AS (SELECT y, ab.r,
         |  (((ab.a * x + ab.b) % 2147483647) * 1000000) // 2147483647 AS u
         | FROM hx CROSS JOIN (VALUES ${(0 until 64).map(r =>
              s"(${r}, ${graft.functions.HashFns.minhashA(r)}, " +
                s"${graft.functions.HashFns.minhashB(r)})").mkString(", ")})
         |   AS ab(r, a, b)),
         |w AS (SELECT y, r,
         |  CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
         |       WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
         |       WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
         |       WHEN u < 999916 THEN 6 ELSE 7 END AS w
         | FROM us),
         |means AS (SELECT r,
         |  CAST((SUM(CAST(w AS HUGEINT) * y) * 1000000)
         |    // NULLIF(CAST(SUM(w) AS BIGINT), 0) AS BIGINT) AS rm
         | FROM w GROUP BY r),
         |ranked AS (SELECT rm, row_number() OVER (ORDER BY rm, r) AS rk
         | FROM means WHERE rm IS NOT NULL),
         |lo AS (SELECT rm AS ci_lo_micro FROM ranked WHERE rk = 4),
         |hi AS (SELECT rm AS ci_hi_micro FROM ranked WHERE rk = 61)
         |SELECT n_orders, CAST(64 AS BIGINT) AS n_resamples, mean_micro,
         | ci_lo_micro, ci_hi_micro
         |FROM pt, lo, hi""".stripMargin
  )

  private def norm(c: String) = normTextSql(c)

  /** Shared shingle-hash CTE prefix over documents (32-bit md5-prefix of
    * char-5-grams of the normalized text).
    */
  /** SELECT body of the `celled` CTE: every embedding with its nearest
    * (`cell`) and second-nearest (`cell2`) fixed IVF centroid — the
    * DuckDB mirror of SimilarityOps.withIvfCells. Shared by the IVF ANN
    * and semantic-dedup oracles.
    */
  private val ivfCelledSelect: String = {
    def centroidDot(k: Int) =
      s"list_reduce(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * (CAST((69069 * (${k * 64} + i - 1) + 12345) % 4096 AS DOUBLE) / 2048.0 - 1.0)), (x, y) -> x + y)"
    val scoreCols = (0 until 16).map { k =>
      s"(${graft.operators.SimilarityOps.centroidNorm2(k)} - 2.0 * ${centroidDot(k)}) AS s$k"
    }.mkString(", ")
    val mExpr = s"LEAST(${(0 until 16).map(k => s"s$k").mkString(", ")}) AS m"
    val cellCase = "CASE " + (0 until 16).map(k => s"WHEN s$k = m THEN $k").mkString(" ") + " END AS cell"
    val maskedCols = (0 until 16)
      .map(k => s"CASE WHEN s$k = m THEN ${Double.MaxValue} ELSE s$k END AS t$k").mkString(", ")
    val m2Expr = s"LEAST(${(0 until 16).map(k => s"t$k").mkString(", ")}) AS m2"
    val cell2Case = "CASE " + (0 until 16).map(k => s"WHEN t$k = m2 THEN $k").mkString(" ") + " END AS cell2"
    s"""SELECT vec_id, embedding, label, $scoreCols, $mExpr, $cellCase, $maskedCols,
       |  $m2Expr, $cell2Case
       | FROM embeddings""".stripMargin
  }

  /** PQ codebook fragments (SimilarityOps.pqWeight mirror): the
    * scored→mins→coded CTE chain assigning 8 subspace codes per vector
    * of `src` (which must expose `embedding` plus the `carry` columns),
    * shared by embed_pq_ann and embed_ivfpq_ann.
    */
  private def pqCodedCtes(src: String, carry: Seq[String],
      sfx: String = ""): String = {
    import graft.operators.SimilarityOps.{pqCentNorm2, PqCent, PqSub}
    val scoreCols = (for (m <- 0 until PqSub; j <- 0 until PqCent) yield
      s"(${pqCentNorm2(m, j)} - 2.0 * ${pqDotSub(src, m, j)}) AS s${m}_$j")
      .mkString(", ")
    val minCols = (0 until PqSub).map(m =>
      s"LEAST(${(0 until PqCent).map(j => s"s${m}_$j").mkString(", ")}) AS mn$m")
      .mkString(", ")
    val codeCols = (0 until PqSub).map { m =>
      "CASE " + (0 until PqCent).map(j => s"WHEN s${m}_$j = mn$m THEN $j")
        .mkString(" ") + s" END AS code$m"
    }.mkString(", ")
    val c = carry.mkString(", ")
    s"""scored$sfx AS (SELECT $c, embedding, $scoreCols FROM $src),
       |mins$sfx AS (SELECT *, $minCols FROM scored$sfx),
       |coded$sfx AS MATERIALIZED (SELECT $c, $codeCols FROM mins$sfx)""".stripMargin
  }

  private def pqWSql(m: Int, j: Int): String = {
    val c = m * graft.operators.SimilarityOps.PqCent + j
    s"(CAST((69069 * (($c) * 64 + ${m * 8} + i - 1) + 12345) % 4096 AS DOUBLE) / 2048.0 - 1.0)"
  }

  private def pqDotSub(tbl: String, m: Int, j: Int): String =
    s"list_reduce(list_transform(generate_series(1, 8), i -> $tbl.embedding[${m * 8} + i]::DOUBLE * ${pqWSql(m, j)}), (x, y) -> x + y)"

  /** Dot of `tbl`'s subspace-`m` slice against coarse-centroid `c`'s
    * same slice — the ⟨x_m, C_c,m⟩ term of residual coding; dyadic
    * weights via the centroidWeight closed form, left-fold like the
    * Spark DotProduct.
    */
  private def centSubDotSql(tbl: String, c: Int, m: Int): String =
    s"list_reduce(list_transform(generate_series(1, 8), i -> $tbl.embedding[${m * 8} + i]::DOUBLE * (CAST((69069 * (${c * 64 + m * 8} + i - 1) + 12345) % 4096 AS DOUBLE) / 2048.0 - 1.0)), (x, y) -> x + y)"

  /** 16-branch cell CASE of the shifted-centroid norm literals
    * ‖C_c[sub m] + cb_{m,j}‖² (SimilarityOps.residualShiftNorm2 —
    * computed driver-side, inlined identically in both engines).
    */
  private def residualShiftCaseSql(cellRef: String, m: Int, j: Int): String =
    "(CASE " + cellRef + " " + (0 until 16).map { c =>
      s"WHEN $c THEN ${graft.operators.SimilarityOps.residualShiftNorm2(
        graft.operators.SimilarityOps.FixedIvfCentroids,
        graft.operators.SimilarityOps.FixedPqCodebook, c, m, j)}"
    }.mkString(" ") + " END)"

  /** RESIDUAL PQ coding chain (SimilarityOps.withResidualPqCodes mirror
    * — IVFADC): `src` must expose `embedding` and `cell` (cell listed in
    * `carry`); scores are (‖C+cb‖² − 2·⟨x_m, C_cell,m⟩ − 2·⟨x_m,
    * cb_{m,j}⟩) with the cell-dependent terms as 16-branch CASEs, same
    * association order as the Spark column expression.
    */
  private def pqResidualCodedCtes(src: String, carry: Seq[String],
      sfx: String = ""): String = {
    import graft.operators.SimilarityOps.{PqCent, PqSub}
    val c = carry.mkString(", ")
    val rd = s"resdots$sfx"
    val dcCols = (0 until PqSub).map { m =>
      "(CASE cell " + (0 until 16).map(cc =>
        s"WHEN $cc THEN ${centSubDotSql(src, cc, m)}").mkString(" ") +
        s" END) AS dc$m"
    }.mkString(", ")
    val scoreCols = (for (m <- 0 until PqSub; j <- 0 until PqCent) yield
      s"(${residualShiftCaseSql("cell", m, j)} - 2.0 * dc$m - 2.0 * ${pqDotSub(rd, m, j)}) AS s${m}_$j")
      .mkString(", ")
    val minCols = (0 until PqSub).map(m =>
      s"LEAST(${(0 until PqCent).map(j => s"s${m}_$j").mkString(", ")}) AS mn$m")
      .mkString(", ")
    val codeCols = (0 until PqSub).map { m =>
      "CASE " + (0 until PqCent).map(j => s"WHEN s${m}_$j = mn$m THEN $j")
        .mkString(" ") + s" END AS code$m"
    }.mkString(", ")
    s"""$rd AS (SELECT $c, embedding, $dcCols FROM $src),
       |scored$sfx AS (SELECT $c, $scoreCols FROM $rd),
       |mins$sfx AS (SELECT *, $minCols FROM scored$sfx),
       |coded$sfx AS MATERIALIZED (SELECT $c, $codeCols FROM mins$sfx)""".stripMargin
  }

  /** Residual per-(query, probed cell) LUT columns (SimilarityOps.
    * residualLutCols mirror): `src` exposes `embedding` and the PROBED
    * `cell`; entry (m, j) = ⟨q_m,q_m⟩ − 2·dq_m − 2·⟨q_m, cb_{m,j}⟩ +
    * ‖C+cb‖², same association order as the Spark columns. Emitted as a
    * two-CTE chain ending in `qlut$sfx(…carry…, lut{m}_{j}…)`.
    */
  private def pqResidualLutCtes(src: String, carry: Seq[String],
      sfx: String = ""): String = {
    import graft.operators.SimilarityOps.{PqCent, PqSub}
    val c = carry.mkString(", ")
    val qd = s"qdots$sfx"
    def qn(m: Int) =
      s"list_reduce(list_transform(generate_series(1, 8), i -> $src.embedding[${m * 8} + i]::DOUBLE * $src.embedding[${m * 8} + i]::DOUBLE), (x, y) -> x + y)"
    val dqCols = (0 until PqSub).map { m =>
      "(CASE cell " + (0 until 16).map(cc =>
        s"WHEN $cc THEN ${centSubDotSql(src, cc, m)}").mkString(" ") +
        s" END) AS dq$m"
    }.mkString(", ")
    val qnCols = (0 until PqSub).map(m => s"${qn(m)} AS qn$m").mkString(", ")
    val lutCols = (for (m <- 0 until PqSub; j <- 0 until PqCent) yield
      s"(qn$m - 2.0 * dq$m - 2.0 * ${pqDotSub(qd, m, j)} + ${residualShiftCaseSql("cell", m, j)}) AS lut${m}_$j")
      .mkString(", ")
    s"""$qd AS (SELECT $c, embedding, $qnCols, $dqCols FROM $src),
       |qlut$sfx AS (SELECT $c, $lutCols FROM $qd)""".stripMargin
  }

  /** Residual ADC distance: coded row `c` against LUT row `q` (a
    * `qlut` row) — Σ_m lut_m[code_m], left-fold over subspaces like the
    * Spark reduceLeft.
    */
  private lazy val pqResidualAdcSql: String = {
    import graft.operators.SimilarityOps.{PqCent, PqSub}
    (0 until PqSub).map { m =>
      "(CASE c.code" + m + " " + (0 until PqCent).map(j =>
        s"WHEN $j THEN q.lut${m}_$j").mkString(" ") + " END)"
    }.reduceLeft((a, b) => s"($a + $b)")
  }

  /** ADC distance between query row `q` and coded row `c` — left-fold
    * sum over subspaces, matching the Spark reduceLeft order.
    */
  private lazy val pqAdcSql: String = {
    import graft.operators.SimilarityOps.{pqCentNorm2, PqCent, PqSub}
    def qn(m: Int) =
      s"list_reduce(list_transform(generate_series(1, 8), i -> q.embedding[${m * 8} + i]::DOUBLE * q.embedding[${m * 8} + i]::DOUBLE), (x, y) -> x + y)"
    (0 until PqSub).map { m =>
      "(CASE c.code" + m + " " + (0 until PqCent).map(j =>
        s"WHEN $j THEN (${qn(m)} - 2.0 * ${pqDotSub("q", m, j)} + ${pqCentNorm2(m, j)})")
        .mkString(" ") + " END)"
    }.reduceLeft((a, b) => s"($a + $b)")
  }

  /** Cosine similarity between rows aliased `a` and `b` in DuckDB list
    * arithmetic, rounded to 6 places (the shared output convention).
    */
  private def cosineSql(a: String, b: String): String = {
    def dotSql(x: String, y: String) =
      s"list_reduce(list_transform(generate_series(1, 64), i -> $x.embedding[i]::DOUBLE * $y.embedding[i]::DOUBLE), (x, y) -> x + y)"
    s"ROUND(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"
  }

  private val shingleCte =
    s"""norm AS (SELECT doc_id, ${norm("text")} AS t FROM documents),
       |sh AS (SELECT doc_id, ${hash32Sql("substr(t, i, 5)")} AS x
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t)-4)) AS i
       |        FROM norm WHERE length(t) >= 5))""".stripMargin

  /** Exact n-gram-Jaccard chain (PPJoin prefix filter + df cap, the
    * DedupOps.dedupNgramJaccard mirror) ending in CTE `jp(doc_a, doc_b,
    * jaccard)` — the τ ≥ 0.5 exact near-dup pair set. Shared by
    * dedup_ngram_jaccard and lsh_band_tuning.
    */
  private val jaccardPairsCte: String =
    s"""$shingleCte,
       |shd AS MATERIALIZED (SELECT DISTINCT doc_id, x FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |dfs AS (SELECT x, count(*) AS df FROM shd GROUP BY x),
       |kept AS (SELECT doc_id, x FROM (
       |  SELECT shd.doc_id, shd.x, dfs.df, s.n, row_number() OVER (
       |    PARTITION BY shd.doc_id ORDER BY dfs.df, shd.x) AS rnk
       |  FROM shd JOIN dfs ON shd.x = dfs.x
       |   JOIN sizes s ON s.doc_id = shd.doc_id)
       | WHERE rnk <= n - ((n * 500000 + 999999) // 1000000) + 1
       |  AND df <= 50),
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b ON a.x = b.x AND a.doc_id < b.doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM shd a JOIN shd b ON a.x = b.x AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |jp AS MATERIALIZED (SELECT * FROM (
       |  SELECT c.doc_a, c.doc_b,
       |   ROUND(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
       |  FROM cands c JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |  JOIN sizes sa ON sa.doc_id = c.doc_a
       |  JOIN sizes sb ON sb.doc_id = c.doc_b)
       | WHERE jaccard >= 0.5)""".stripMargin

  /** Full MinHash→LSH chain ending in CTE `lshp(doc_a, doc_b,
    * est_jaccard)` — the filtered (≥ 0.5) near-dup pair set. Shared by
    * the pair query and the connected-components cluster query.
    */
  private val minhashPairsCte: String = {
    val bandsUnion = (0 until graft.functions.HashFns.MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql(b)} AS key FROM mh")
      .mkString(" UNION ALL ")
    val estExpr = (0 until graft.functions.HashFns.MinhashK)
      .map(i => s"CASE WHEN ma.h$i = mb.h$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""$shingleCte,
       |mh AS MATERIALIZED (SELECT doc_id, ${minhashAggSql("x").mkString(", ")}
       |  FROM sh GROUP BY doc_id),
       |bands AS ($bandsUnion),
       |keepk AS (SELECT band, key FROM (
       |  SELECT band, key, count(*) AS bf FROM bands GROUP BY band, key)
       |  WHERE bf <= ${graft.operators.DedupOps.LshBucketCap}),
       |capped AS (SELECT bands.* FROM bands JOIN keepk USING (band, key)),
       |cpairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN capped b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |lshp AS MATERIALIZED (SELECT * FROM (
       |  SELECT doc_a, doc_b,
       |   ROUND(CAST(($estExpr) AS DOUBLE) / 32.0, 4) AS est_jaccard
       |  FROM cpairs JOIN mh ma ON ma.doc_id = doc_a JOIN mh mb ON mb.doc_id = doc_b)
       |  WHERE est_jaccard >= 0.5)""".stripMargin
  }

  /** SimHash band-bucket candidate-pair CTEs (assumes a `norm(doc_id, t)`
    * CTE precedes, as in [[shingleCte]]) ending in `shp(doc_a, doc_b,
    * hamming)` — the Hamming ≤ 3 near-dup pair set. Shared by
    * dedup_simhash and dedup_method_overlap.
    */
  private val simhashPairsCte: String = {
    val sums = (0 until 60)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(", ")
    val simExpr = (0 until 60)
      .map(j => s"(CASE WHEN b$j >= 0 THEN (1::BIGINT << $j) ELSE 0 END)")
      .mkString(" + ")
    val bandsUnion = (0 until 4)
      .map(b => s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 15}) & 32767 AS key FROM ssim")
      .mkString(" UNION ALL ")
    s"""stok AS (SELECT doc_id, ${hash60Sql("tk")} AS h
       |  FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS tk
       |        FROM norm WHERE length(t) > 0)),
       |ssums AS (SELECT doc_id, $sums FROM stok GROUP BY doc_id),
       |ssim AS (SELECT doc_id, $simExpr AS simhash FROM ssums),
       |sbands AS ($bandsUnion),
       |shp AS (SELECT * FROM (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |  FROM sbands a JOIN sbands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |  WHERE hamming <= 3)""".stripMargin
  }

  /** Connected-component labeling CTEs over the `lshp` pair set (assumes
    * [[minhashPairsCte]] precedes them) ending in `todrop` — shared by
    * dedup_survivors and curated_corpus.
    */
  private val ccTodropCtes: String =
    """edges AS (SELECT doc_a AS src, doc_b AS dst FROM lshp
      |          UNION SELECT doc_b, doc_a FROM lshp),
      |reach AS (SELECT DISTINCT src AS node, src AS lbl FROM edges
      |          UNION
      |          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
      |lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
      |        FROM reach GROUP BY node),
      |todrop AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)""".stripMargin

  /** Full quality_score query (also exposed as its own oracle entry). */
  private lazy val qualityScoreSql: String = {
    val enArr = graft.operators.TextOps.Stopwords.head._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH base AS (SELECT doc_id,
       |  CAST(length(${norm("text")}) AS BIGINT) AS n_chars,
       |  CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
       |       ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS n_tokens,
       |  CAST(length(regexp_replace(${norm("text")}, '[^a-z ]', '', 'g')) AS BIGINT)
       |    AS n_alpha_space,
       |  CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
       |       ELSE len(list_filter(string_split(${norm("text")}, ' '),
       |                x -> list_contains($enArr, x))) END AS BIGINT) AS n_stop
       | FROM documents)
       |SELECT doc_id, n_chars, n_tokens,
       | ROUND(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1), 4) AS stop_ratio,
       | ROUND(CAST(n_chars - n_alpha_space AS DOUBLE) / GREATEST(n_chars, 1), 4)
       |   AS special_ratio,
       | ROUND(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / GREATEST(n_tokens, 1), 4)
       |   AS avg_word_len,
       | ROUND(CAST(0.4 AS DOUBLE) * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
       |  + CAST(0.3 AS DOUBLE) * (1.0 - ROUND(CAST(n_chars - n_alpha_space AS DOUBLE) / GREATEST(n_chars, 1), 4))
       |  + CAST(0.3 AS DOUBLE) * LEAST(ROUND(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1), 4) * 4.0, 1.0), 4)
       |   AS quality_score
       |FROM base""".stripMargin
  }

  /** The quality gate's first-failing-rule CASE over [[qualityScoreSql]]
    * columns — shared by quality_gate and quality_classifier_score (the
    * classifier trains against the gate's verdicts; one rule text keeps
    * label and gate in lockstep, mirroring TextOps.gateReason).
    */
  private val gateReasonSql: String =
    """CASE WHEN n_tokens IS NULL OR n_tokens < 15 THEN 'too_short'
      |      WHEN special_ratio > 0.05 THEN 'special_chars'
      |      WHEN stop_ratio < 0.08 THEN 'low_stopword'
      |      WHEN avg_word_len < 3.0 OR avg_word_len > 10.0 THEN 'word_length'
      |      ELSE NULL END""".stripMargin

  /** Full stratified_sample query (also its own oracle entry). */
  private lazy val stratifiedSampleSql: String = {
    val rateCase = graft.operators.PipelineOps.SampleRatePct
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, lang, sample_bucket, keep_rate_pct FROM (
       | SELECT doc_id, lang,
       |  ${hash32Sql(s"'${graft.operators.PipelineOps.SampleSalt}' || CAST(doc_id AS VARCHAR)")} % 100
       |    AS sample_bucket,
       |  CAST(CASE lang $rateCase ELSE 0 END AS BIGINT) AS keep_rate_pct
       | FROM documents)
       |WHERE sample_bucket < keep_rate_pct""".stripMargin
  }

  private val dPipeline: Map[String, String] = Map(
    "dedup_exact" ->
      s"""SELECT min(doc_id) AS doc_id, md5(${norm("text")}) AS content_hash,
         | count(*) AS n_copies
         |FROM documents GROUP BY md5(${norm("text")})""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $jaccardPairsCte
         |SELECT doc_a, doc_b, jaccard FROM jp""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $minhashPairsCte
         |SELECT doc_a, doc_b, est_jaccard FROM lshp""".stripMargin,

    // both legs reuse the shared CTE fragments; the report is one
    // pair-list-sized full-outer join over them
    "lsh_recall_report" ->
      s"""WITH $minhashPairsCte,
         |shd AS MATERIALIZED (SELECT DISTINCT doc_id, x FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
         |dfs AS (SELECT x, count(*) AS df FROM shd GROUP BY x),
         |kept AS (SELECT doc_id, x FROM (
         |  SELECT shd.doc_id, shd.x, dfs.df, s.n, row_number() OVER (
         |    PARTITION BY shd.doc_id ORDER BY dfs.df, shd.x) AS rnk
         |  FROM shd JOIN dfs ON shd.x = dfs.x
         |   JOIN sizes s ON s.doc_id = shd.doc_id)
         | WHERE rnk <= n - ((n * 500000 + 999999) // 1000000) + 1
         |  AND df <= 50),
         |jcands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM kept a JOIN kept b ON a.x = b.x AND a.doc_id < b.doc_id),
         |jinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |  FROM shd a JOIN shd b ON a.x = b.x AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (SELECT doc_a, doc_b FROM (
         |  SELECT c.doc_a, c.doc_b,
         |   ROUND(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
         |  FROM jcands c JOIN jinter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |  JOIN sizes sa ON sa.doc_id = c.doc_a
         |  JOIN sizes sb ON sb.doc_id = c.doc_b)
         | WHERE jaccard >= 0.5),
         |m AS (SELECT
         |  CASE WHEN jp.doc_a IS NOT NULL THEN 1 ELSE 0 END AS t,
         |  CASE WHEN lp.doc_a IS NOT NULL THEN 1 ELSE 0 END AS e
         | FROM jp FULL OUTER JOIN (SELECT doc_a, doc_b FROM lshp) lp
         |  ON jp.doc_a = lp.doc_a AND jp.doc_b = lp.doc_b)
         |SELECT CAST(SUM(t) AS BIGINT) AS n_true_pairs,
         | CAST(SUM(e) AS BIGINT) AS n_est_pairs,
         | CAST(SUM(t * e) AS BIGINT) AS n_common,
         | CASE WHEN SUM(e) > 0 THEN
         |  CAST((SUM(t * e) * 1000000) // SUM(e) AS BIGINT) END AS precision_micro,
         | CASE WHEN SUM(t) > 0 THEN
         |  CAST((SUM(t * e) * 1000000) // SUM(t) AS BIGINT) END AS recall_micro
         |FROM m""".stripMargin,

    // one-sided prefix filter (only the SMALL side is cut), exact
    // verify on full distinct-shingle sets, integer threshold test
    "dedup_containment" ->
      s"""WITH $shingleCte,
         |shd AS MATERIALIZED (SELECT DISTINCT doc_id, x FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
         |dfs AS (SELECT x, count(*) AS df FROM shd GROUP BY x),
         |kept AS (SELECT shd.doc_id, shd.x, dfs.df, s.n
         |  FROM shd JOIN dfs ON shd.x = dfs.x
         |   JOIN sizes s ON s.doc_id = shd.doc_id
         |  WHERE dfs.df <= 50),
         |pfx AS (SELECT doc_id, x FROM (
         |   SELECT doc_id, x, n, row_number() OVER (
         |     PARTITION BY doc_id ORDER BY df, x) AS rnk FROM kept)
         |  WHERE rnk <= n - ((n * 800000 + 999999) // 1000000) + 1),
         |cands AS (SELECT DISTINCT p.doc_id AS doc_small, k.doc_id AS doc_big
         |  FROM pfx p JOIN kept k ON p.x = k.x AND p.doc_id <> k.doc_id),
         |inter AS (SELECT c.doc_small, c.doc_big, count(*) AS i
         |  FROM cands c JOIN shd a ON a.doc_id = c.doc_small
         |   JOIN shd b ON b.doc_id = c.doc_big AND b.x = a.x
         |  GROUP BY 1, 2)
         |SELECT doc_small, doc_big, sa.n AS n_small, sb.n AS n_big,
         | ROUND(CAST(i AS DOUBLE) / sa.n, 4) AS containment
         |FROM inter JOIN sizes sa ON sa.doc_id = doc_small
         | JOIN sizes sb ON sb.doc_id = doc_big
         |WHERE i * 1000000 >= sa.n * 800000""".stripMargin,

    // incremental screening: incoming (doc_id % 10 >= 8) bands join only
    // existing bands — no self-join, no bucket cap (the existing side is
    // a precomputed index in production)
    "dedup_incremental" -> {
      def bandsOf(tbl: String) = (0 until graft.functions.HashFns.MinhashBands)
        .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql(b)} AS key FROM $tbl")
        .mkString(" UNION ALL ")
      val estExpr = (0 until graft.functions.HashFns.MinhashK)
        .map(i => s"CASE WHEN ma.h$i = mb.h$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $shingleCte,
         |mh AS MATERIALIZED (SELECT doc_id, ${minhashAggSql("x").mkString(", ")}
         |  FROM sh GROUP BY doc_id),
         |inc AS (SELECT * FROM mh WHERE doc_id % 10 >= 8),
         |ex AS (SELECT * FROM mh WHERE doc_id % 10 < 8),
         |bi AS (${bandsOf("inc")}),
         |be AS (${bandsOf("ex")}),
         |cpairs AS (SELECT DISTINCT bi.doc_id AS doc_inc, be.doc_id AS doc_ex
         |  FROM bi JOIN be ON bi.band = be.band AND bi.key = be.key),
         |scored AS (SELECT * FROM (
         |  SELECT doc_inc, doc_ex,
         |   ROUND(CAST(($estExpr) AS DOUBLE) / 32.0, 4) AS est
         |  FROM cpairs JOIN mh ma ON ma.doc_id = doc_inc
         |   JOIN mh mb ON mb.doc_id = doc_ex)
         |  WHERE est >= 0.5),
         |sel AS (SELECT doc_inc, doc_ex, est,
         |  COUNT(*) OVER (PARTITION BY doc_inc) AS n_matches,
         |  row_number() OVER (PARTITION BY doc_inc
         |    ORDER BY est DESC, doc_ex) AS rn
         | FROM scored)
         |SELECT doc_inc, n_matches, est AS best_est, doc_ex AS best_doc_ex
         |FROM sel WHERE rn = 1""".stripMargin
    },

    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM lshp
         |          UNION SELECT doc_b, doc_a FROM lshp),
         |reach AS (SELECT DISTINCT src AS node, src AS lbl FROM edges
         |          UNION
         |          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
         |lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
         |        FROM reach GROUP BY node)
         |SELECT doc_id, cluster_id,
         | COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         | doc_id = cluster_id AS is_representative
         |FROM lab""".stripMargin,

    "dedup_survivors" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |$ccTodropCtes
         |SELECT doc_id, lang, source, n_chars FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM todrop t WHERE t.doc_id = d.doc_id)""".stripMargin,

    // end-to-end curation verdict: near-dup survivors ∩ quality gate ∩
    // reproducible stratified sample — composed from the same shared CTEs
    // the individual oracles use
    "curated_corpus" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |$ccTodropCtes,
         |q AS ($qualityScoreSql),
         |samp AS ($stratifiedSampleSql)
         |SELECT doc_id, lang, source, n_chars FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM todrop t WHERE t.doc_id = d.doc_id)
         |  AND EXISTS (SELECT 1 FROM q
         |    WHERE q.doc_id = d.doc_id AND q.quality_score >= 0.5)
         |  AND EXISTS (SELECT 1 FROM samp WHERE samp.doc_id = d.doc_id)""".stripMargin,

    "dedup_spans" -> {
      val span = graft.operators.DedupOps.SpanTokens
      s"""WITH d AS (SELECT doc_id, string_split(${norm("text")}, ' ') AS ts
         |  FROM documents WHERE length(${norm("text")}) > 0),
         |g AS (SELECT doc_id,
         |  ${hash32Sql(s"array_to_string(ts[i:i+${span - 1}], ' ')")} AS h
         | FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-${span - 1})) AS i
         |       FROM d WHERE len(ts) >= $span)),
         |s AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY h)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         | CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
         | ROUND(CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |   / COUNT(*), 4) AS dup_fraction
         |FROM g JOIN s USING (h)
         |GROUP BY doc_id""".stripMargin
    },

    // DedupOps.dedupSubstrings: duplicated-window starts merge into
    // maximal token runs (interval union via per-doc running max of the
    // interval end over preceding rows), runs < minTokens drop, per-doc
    // removal verdict by exact integer comparison.
    "dedup_substrings" -> {
      val span = graft.operators.DedupOps.SpanTokens
      val minT = graft.operators.DedupOps.SubstringMinTokens
      s"""WITH d AS (SELECT doc_id, string_split(${norm("text")}, ' ') AS ts
         |  FROM documents WHERE length(${norm("text")}) > 0),
         |g AS (SELECT doc_id, len(ts) AS doc_tokens, i,
         |  ${hash32Sql(s"array_to_string(ts[i:i+${span - 1}], ' ')")} AS h
         | FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-${span - 1})) AS i
         |       FROM d WHERE len(ts) >= $span)),
         |s AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY h),
         |ds AS (SELECT doc_id, doc_tokens, i, i + ${span - 1} AS e
         |  FROM g JOIN s USING (h) WHERE n_docs >= 2),
         |brk AS (SELECT doc_id, doc_tokens, i, e,
         |  CASE WHEN i > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
         |   THEN 1 ELSE 0 END AS b
         |  FROM ds),
         |isl AS (SELECT doc_id, doc_tokens, i, e,
         |  SUM(b) OVER (PARTITION BY doc_id ORDER BY i) AS island FROM brk),
         |islands AS (SELECT doc_id, doc_tokens, island,
         |  MAX(e) - MIN(i) + 1 AS run_tokens
         | FROM isl GROUP BY 1, 2, 3),
         |q AS (SELECT * FROM islands WHERE run_tokens >= $minT)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
         | CAST(MAX(run_tokens) AS BIGINT) AS longest_run,
         | CAST(SUM(run_tokens) AS BIGINT) AS dup_tokens,
         | CAST(doc_tokens AS BIGINT) AS n_tokens,
         | CAST(SUM(run_tokens) AS BIGINT) * 2 >= doc_tokens AS drop_doc
         |FROM q GROUP BY doc_id, doc_tokens""".stripMargin
    },

    // DedupOps.substringReport: the same maximal-run islands, each run
    // reconstructed as its normalized token snippet; identical snippets
    // group and the top-20 land by (n_docs, run_tokens, snippet).
    "substring_report" -> {
      val span = graft.operators.DedupOps.SpanTokens
      val minT = graft.operators.DedupOps.SubstringMinTokens
      s"""WITH d AS (SELECT doc_id, string_split(${norm("text")}, ' ') AS ts
         |  FROM documents WHERE length(${norm("text")}) > 0),
         |g AS (SELECT doc_id, i,
         |  ${hash32Sql(s"array_to_string(ts[i:i+${span - 1}], ' ')")} AS h
         | FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-${span - 1})) AS i
         |       FROM d WHERE len(ts) >= $span)),
         |s AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY h),
         |ds AS (SELECT doc_id, i, i + ${span - 1} AS e
         |  FROM g JOIN s USING (h) WHERE n_docs >= 2),
         |brk AS (SELECT doc_id, i, e,
         |  CASE WHEN i > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
         |   THEN 1 ELSE 0 END AS b
         |  FROM ds),
         |isl AS (SELECT doc_id, i, e,
         |  SUM(b) OVER (PARTITION BY doc_id ORDER BY i) AS island FROM brk),
         |runs AS (SELECT doc_id, island, MIN(i) AS si, MAX(e) AS se,
         |  MAX(e) - MIN(i) + 1 AS run_tokens
         | FROM isl GROUP BY 1, 2
         | HAVING MAX(e) - MIN(i) + 1 >= $minT),
         |snip AS (SELECT r.doc_id, r.run_tokens,
         |  array_to_string(d.ts[r.si:r.se], ' ') AS snippet
         | FROM runs r JOIN d USING (doc_id))
         |SELECT snippet, CAST(MAX(run_tokens) AS BIGINT) AS run_tokens,
         | CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         | CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         | MIN(doc_id) AS example_doc_id
         |FROM snip GROUP BY snippet
         |ORDER BY n_docs DESC, run_tokens DESC, snippet LIMIT 20""".stripMargin
    },

    "dedup_simhash" ->
      s"""WITH norm AS (SELECT doc_id, ${norm("text")} AS t FROM documents),
         |$simhashPairsCte
         |SELECT doc_a, doc_b, hamming FROM shp""".stripMargin,

    "dedup_method_overlap" ->
      s"""WITH $minhashPairsCte,
         |$simhashPairsCte,
         |exact_d AS (SELECT doc_id FROM (
         |  SELECT doc_id, COUNT(*) OVER (PARTITION BY md5(t)) AS n FROM norm)
         |  WHERE n >= 2),
         |mh_d AS (SELECT doc_a AS doc_id FROM lshp
         |         UNION SELECT doc_b FROM lshp),
         |sh_d AS (SELECT doc_a AS doc_id FROM shp
         |         UNION SELECT doc_b FROM shp),
         |flags AS (
         | SELECT doc_id, 'exact' AS method FROM exact_d
         | UNION ALL SELECT doc_id, 'minhash' FROM mh_d
         | UNION ALL SELECT doc_id, 'simhash' FROM sh_d)
         |SELECT doc_id,
         | MAX(CASE WHEN method = 'exact' THEN 1 ELSE 0 END) = 1 AS by_exact,
         | MAX(CASE WHEN method = 'minhash' THEN 1 ELSE 0 END) = 1 AS by_minhash,
         | MAX(CASE WHEN method = 'simhash' THEN 1 ELSE 0 END) = 1 AS by_simhash,
         | CAST(COUNT(*) AS BIGINT) AS n_methods
         |FROM flags GROUP BY doc_id""".stripMargin,

    "source_overlap" ->
      s"""WITH fp AS (
         | SELECT DISTINCT md5(${norm("text")}) AS h, source FROM documents),
         |per AS (SELECT source, COUNT(*) AS n_fp FROM fp GROUP BY source),
         |sh AS (
         | SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_shared
         | FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
         | GROUP BY 1, 2)
         |SELECT p1.source AS source_a, p2.source AS source_b,
         | CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
         | p1.n_fp AS n_a, p2.n_fp AS n_b,
         | (CAST(COALESCE(sh.n_shared, 0) AS BIGINT) * 1000000)
         |   // (p1.n_fp + p2.n_fp - COALESCE(sh.n_shared, 0)) AS jaccard_micro
         |FROM per p1 JOIN per p2 ON p1.source < p2.source
         |LEFT JOIN sh ON sh.sa = p1.source AND sh.sb = p2.source""".stripMargin,

    // DedupOps.lshBandTuning: expected recall of each (bands × rows)
    // banding over the observed exact-Jaccard pairs, with the S-curve
    // 1-(1-j^r)^b in micro-unit fixed point — the power is UNROLLED with
    // a floor after every multiply (powMicroSql), identical in both
    // engines, never libm pow().
    "lsh_band_tuning" -> {
      def pm(base: String, e: Int): String =
        (2 to e).foldLeft(base)((acc, _) => s"(($acc) * ($base)) // 1000000")
      val rows = Seq((16, 2), (8, 4), (4, 8)).map { case (b, r) =>
        val sr = pm("j", r)
        val qb = pm(s"(1000000 - ($sr))", b)
        s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
           | COUNT(*) AS n_true_pairs,
           | CAST(SUM(CAST(1000000 - ($qb) AS HUGEINT))
           |   // NULLIF(COUNT(*), 0) AS BIGINT) AS expected_recall_micro
           |FROM jm""".stripMargin
      }.mkString("\nUNION ALL\n")
      // jm MATERIALIZED: three UNION branches read it — without the
      // keyword DuckDB inlines the whole quadratic jp chain into each
      // branch (3× the work and 3× the spill; hit a temp-disk limit at
      // sf0.1)
      s"""WITH $jaccardPairsCte,
         |jm AS MATERIALIZED (
         | SELECT CAST(ROUND(jaccard * 1000000) AS BIGINT) AS j FROM jp)
         |$rows""".stripMargin
    },

    // DedupOps.jaccardSimHistogram: 0.05 bins over [0.5, 1.0] of the
    // exact pair similarities (j = 1.0 clamps into the top bin).
    "jaccard_sim_histogram" ->
      s"""WITH $jaccardPairsCte,
         |b AS (SELECT LEAST(CAST(ROUND(jaccard * 1000000) AS BIGINT) // 50000 - 10, 9)
         |   AS bin FROM jp)
         |SELECT bin, ROUND(CAST(0.5 AS DOUBLE) + bin * CAST(0.05 AS DOUBLE), 2) AS bin_lo,
         | ROUND(CAST(0.55 AS DOUBLE) + bin * CAST(0.05 AS DOUBLE), 2) AS bin_hi,
         | COUNT(*) AS n_pairs
         |FROM b GROUP BY bin""".stripMargin,

    // TextOps.tokenizerFertility: tokens per 100 chars per language —
    // the char→token budgeting constant; exact integer micro ratio.
    "tokenizer_fertility" ->
      s"""WITH d AS (
         | SELECT lang, CAST(len(string_split(norm, ' ')) AS BIGINT) AS toks,
         |  CAST(length(norm) AS BIGINT) AS chars
         | FROM (SELECT lang, ${norm("text")} AS norm FROM documents)
         | WHERE length(norm) > 0)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens,
         | CAST(SUM(chars) AS BIGINT) AS n_chars,
         | CAST((CAST(SUM(toks) AS HUGEINT) * 100000000) // SUM(chars) AS BIGINT)
         |   AS tokens_per_100_chars_micro
         |FROM d GROUP BY lang""".stripMargin,

    // PipelineOps.splitLeakage: exact near-dup pairs crossing the
    // train/val/test hash-split boundary — the eval-contamination gate.
    "split_leakage" -> {
      def sp(c: String) =
        s"""CASE WHEN ${hash32Sql(
             s"'${graft.operators.PipelineOps.SplitSalt}' || CAST($c AS VARCHAR)")} % 100 < 80
           | THEN 'train'
           | WHEN ${hash32Sql(
             s"'${graft.operators.PipelineOps.SplitSalt}' || CAST($c AS VARCHAR)")} % 100 < 90
           | THEN 'val' ELSE 'test' END""".stripMargin
      s"""WITH $jaccardPairsCte,
         |sp AS (SELECT doc_a, doc_b, jaccard,
         |  ${sp("doc_a")} AS split_a, ${sp("doc_b")} AS split_b
         | FROM jp)
         |SELECT doc_a, doc_b, split_a, split_b, jaccard
         |FROM sp WHERE split_a <> split_b""".stripMargin
    },

    // DedupOps.dedupDegreeStats: degree census of the MinHash-LSH pair
    // graph (both endpoints of every pair, then a histogram).
    "dedup_degree_stats" ->
      s"""WITH $minhashPairsCte,
         |deg AS (SELECT doc_id, COUNT(*) AS degree FROM (
         |  SELECT doc_a AS doc_id FROM lshp
         |  UNION ALL SELECT doc_b AS doc_id FROM lshp) GROUP BY doc_id)
         |SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY degree""".stripMargin,

    // TextOps.dsirWeights: hashed-unigram importance ratios
    // (add-one-smoothed target/raw cell frequencies) averaged per doc —
    // exact integer micro-units end to end; HUGEINT stays internal.
    "dsir_weights" ->
      s"""WITH toks AS (
         | SELECT doc_id, lang, ${hash32Sql("tok")} % 1024 AS cell
         | FROM (SELECT doc_id, lang,
         |   unnest(string_split(${norm("text")}, ' ')) AS tok
         |  FROM documents WHERE length(${norm("text")}) > 0)),
         |raw AS (SELECT cell, COUNT(*) AS rn FROM toks GROUP BY cell),
         |tgt AS (SELECT cell, COUNT(*) AS tn FROM toks
         | WHERE lang = 'en' GROUP BY cell),
         |tot AS (SELECT COUNT(*) AS rtot,
         |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ttot
         | FROM toks),
         |wts AS (SELECT raw.cell,
         |  CAST((CAST(COALESCE(tn, 0) + 1 AS HUGEINT) * (rtot + 1024) * 1000000)
         |    // (CAST(rn + 1 AS HUGEINT) * (ttot + 1024)) AS BIGINT) AS w_micro
         | FROM raw LEFT JOIN tgt ON raw.cell = tgt.cell, tot)
         |SELECT doc_id, lang, COUNT(*) AS n_tokens,
         | CAST(SUM(CAST(w_micro AS HUGEINT)) // COUNT(*) AS BIGINT) AS dsir_avg_micro
         |FROM toks JOIN wts USING (cell) GROUP BY doc_id, lang""".stripMargin,

    // SimilarityOps.pqAnn: product-quantization codes (8 subspaces × 16
    // centroids, dyadic float-exact weights shared via pqWeight) +
    // asymmetric-distance top-k. Sum order and rounding mirror the Spark
    // reduceLeft exactly; argmin ties go to the smallest centroid index
    // in both engines. Fragments shared with embed_ivfpq_ann.
    "embed_pq_ann" ->
      s"""WITH ${pqCodedCtes("embeddings", Seq("vec_id"))},
         |q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |      WHERE vec_id < 20),
         |sims AS (
         | SELECT q.query_id, c.vec_id AS neighbor_id,
         |  ROUND($pqAdcSql, 6) AS adc_dist2
         | FROM coded c, q WHERE c.vec_id <> q.query_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         | FROM sims)
         |SELECT query_id, rank, neighbor_id, adc_dist2
         |FROM ranked WHERE rank <= 3""".stripMargin,

    // SimilarityOps.ivfPqAnn: IVF cells prune to the two probed lists,
    // RESIDUAL PQ codes (IVFADC — each vector codes x − centroid(cell))
    // rank within them; the celled CTE feeds the residual coding chain,
    // queries carry per-probed-cell residual LUTs, probes join on cell.
    "embed_ivfpq_ann" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |${pqResidualCodedCtes("celled", Seq("vec_id", "cell"))},
         |qsrc AS (SELECT vec_id AS query_id, embedding, cell FROM (
         |  SELECT vec_id, embedding, cell FROM celled WHERE vec_id < 20
         |  UNION ALL
         |  SELECT vec_id, embedding, cell2 AS cell FROM celled WHERE vec_id < 20)),
         |${pqResidualLutCtes("qsrc", Seq("query_id", "cell"))},
         |sims AS (
         | SELECT q.query_id, c.vec_id AS neighbor_id,
         |  ROUND($pqResidualAdcSql, 6) AS adc_dist2
         | FROM coded c JOIN qlut q ON c.cell = q.cell AND c.vec_id <> q.query_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         | FROM sims)
         |SELECT query_id, rank, neighbor_id, adc_dist2
         |FROM ranked WHERE rank <= 3""".stripMargin,

    // SimilarityOps.hybridSearchRrf: reciprocal-rank fusion of the
    // BM25 lexical shortlist (fixed term set, top-20) and the IVF-PQ
    // residual-coded vector shortlist (per query, top-20); RRF score =
    // Σ_legs 10⁹ // (60 + rank), exact integer nano-units, ties on
    // doc_id, fused top-10 per query.
    "hybrid_search_rrf" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |${pqResidualCodedCtes("celled", Seq("vec_id", "cell"))},
         |qsrc AS (SELECT vec_id AS query_id, embedding, cell FROM (
         |  SELECT vec_id, embedding, cell FROM celled WHERE vec_id < 20
         |  UNION ALL
         |  SELECT vec_id, embedding, cell2 AS cell FROM celled WHERE vec_id < 20)),
         |${pqResidualLutCtes("qsrc", Seq("query_id", "cell"))},
         |sims AS (
         | SELECT q.query_id, c.vec_id AS neighbor_id,
         |  ROUND($pqResidualAdcSql, 6) AS adc_dist2
         | FROM coded c JOIN qlut q ON c.cell = q.cell AND c.vec_id <> q.query_id),
         |vec AS (SELECT query_id, neighbor_id AS doc_id,
         |  CAST(vrank AS BIGINT) AS vec_rank FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS vrank
         |  FROM sims) WHERE vrank <= 20),
         |ldocs AS (
         | SELECT doc_id, string_split(${normTextSql("text")}, ' ') AS ts
         | FROM documents WHERE length(${normTextSql("text")}) > 0),
         |ldd AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, ts FROM ldocs),
         |lstats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM ldd),
         |ltf AS (
         | SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
         | FROM (SELECT doc_id, dl, unnest(ts) AS t FROM ldd)
         | WHERE t IN (${graft.operators.TextOps.Bm25Terms.map(t => s"'$t'").mkString(", ")})
         | GROUP BY 1, 2),
         |ldfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ltf GROUP BY 1),
         |lsc AS (
         | SELECT doc_id,
         |  CAST(SUM(CAST(
         |    (CAST(2 * (n_docs - df) + 1 AS HUGEINT) * (44 * tf) * sum_dl
         |      * 1000000) //
         |    (CAST(2 * df + 1 AS HUGEINT) *
         |      ((20 * tf) * sum_dl + 6 * sum_dl + 18 * dl * n_docs))
         |   AS BIGINT)) AS BIGINT) AS score_micro
         | FROM ltf JOIN ldfc USING (term), lstats GROUP BY doc_id),
         |lex AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS lex_rank
         | FROM lsc ORDER BY score_micro DESC, doc_id LIMIT 20),
         |spine AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 20),
         |lexq AS (SELECT s.query_id, l.doc_id, l.lex_rank FROM spine s, lex l),
         |fused AS (SELECT query_id, doc_id,
         |  CAST(COALESCE(1000000000 // (60 + lex_rank), 0)
         |   + COALESCE(1000000000 // (60 + vec_rank), 0) AS BIGINT)
         |    AS rrf_score_nano,
         |  lex_rank, vec_rank
         | FROM vec FULL JOIN lexq USING (query_id, doc_id))
         |SELECT query_id, rank, doc_id, rrf_score_nano, lex_rank, vec_rank
         |FROM (SELECT *, CAST(row_number() OVER (
         |   PARTITION BY query_id ORDER BY rrf_score_nano DESC, doc_id)
         |    AS BIGINT) AS rank FROM fused)
         |WHERE rank <= 10""".stripMargin,

    // SimilarityOps.filteredIvfPqAnn: the IVF-PQ chain with the query's
    // own label added to the probe-join condition — candidates must
    // share the query's metadata label BEFORE the ADC ranking sees
    // them (pre-filtered search, not post-filtered top-k).
    "embed_filtered_ann" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |${pqResidualCodedCtes("celled", Seq("vec_id", "cell", "label"))},
         |qsrc AS (SELECT vec_id AS query_id, embedding, label, cell FROM (
         |  SELECT vec_id, embedding, label, cell FROM celled WHERE vec_id < 20
         |  UNION ALL
         |  SELECT vec_id, embedding, label, cell2 AS cell FROM celled
         |  WHERE vec_id < 20)),
         |${pqResidualLutCtes("qsrc", Seq("query_id", "cell", "label"))},
         |sims AS (
         | SELECT q.query_id, c.vec_id AS neighbor_id,
         |  ROUND($pqResidualAdcSql, 6) AS adc_dist2
         | FROM coded c JOIN qlut q ON c.cell = q.cell AND c.label = q.label
         |  AND c.vec_id <> q.query_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         | FROM sims)
         |SELECT query_id, rank, neighbor_id, adc_dist2
         |FROM ranked WHERE rank <= 3""".stripMargin,

    // SimilarityOps.pqRecallReport: per-query recall of flat-PQ and
    // IVF-PQ against the exact full-precision squared-L2 top-k. The
    // probe legs replay the embed_pq_ann / embed_ivfpq_ann chains
    // (suffixed CTE names); the exact leg mirrors the brute-force shape.
    "pq_recall_report" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |      WHERE vec_id < 20),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND(${dotSql("c", "c")} - 2.0 * ${dotSql("q", "c")}
         |      + ${dotSql("q", "q")}, 6) AS d
         |   FROM embeddings c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 3),
         |${pqCodedCtes("embeddings", Seq("vec_id"), "f")},
         |pqf AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND($pqAdcSql, 6) AS adc_dist2
         |   FROM codedf c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 3),
         |celled AS ($ivfCelledSelect),
         |${pqResidualCodedCtes("celled", Seq("vec_id", "cell"), "r")},
         |qsrcr AS (SELECT vec_id AS query_id, embedding, cell FROM (
         |  SELECT vec_id, embedding, cell FROM celled WHERE vec_id < 20
         |  UNION ALL
         |  SELECT vec_id, embedding, cell2 AS cell FROM celled WHERE vec_id < 20)),
         |${pqResidualLutCtes("qsrcr", Seq("query_id", "cell"), "r")},
         |pqr AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND($pqResidualAdcSql, 6) AS adc_dist2
         |   FROM codedr c JOIN qlutr q ON c.cell = q.cell AND c.vec_id <> q.query_id))
         | WHERE rank <= 3)
         |SELECT ex.query_id, COUNT(*) AS n_exact,
         | CAST(SUM(CASE WHEN pqf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_hit_pq,
         | CAST(SUM(CASE WHEN pqr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_hit_ivfpq,
         | (CAST(SUM(CASE WHEN pqf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) * 1000000) // COUNT(*) AS recall_pq_micro,
         | (CAST(SUM(CASE WHEN pqr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) * 1000000) // COUNT(*) AS recall_ivfpq_micro
         |FROM ex
         |LEFT JOIN pqf ON pqf.query_id = ex.query_id
         | AND pqf.neighbor_id = ex.neighbor_id
         |LEFT JOIN pqr ON pqr.query_id = ex.query_id
         | AND pqr.neighbor_id = ex.neighbor_id
         |GROUP BY ex.query_id""".stripMargin
    },

    // SimilarityOps.pqRerankAnn (fixed codebook): ADC top-32 shortlist
    // over the coded corpus, then exact squared-L2 re-rank to top-3 —
    // fully replayable since the fixed codebook is a literal
    "embed_pq_rerank" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH ${pqCodedCtes("embeddings", Seq("vec_id"), "r")},
         |q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |      WHERE vec_id < 20),
         |sl AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND($pqAdcSql, 6) AS adc_dist2
         |   FROM codedr c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 32),
         |ex AS (SELECT sl.query_id, sl.neighbor_id,
         |  ROUND(${dotSql("c", "c")} - 2.0 * ${dotSql("q", "c")}
         |    + ${dotSql("q", "q")}, 6) AS l2_dist2
         | FROM sl JOIN embeddings c ON c.vec_id = sl.neighbor_id
         |  JOIN q ON q.query_id = sl.query_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, l2_dist2
         |FROM (SELECT *, row_number() OVER (
         |  PARTITION BY query_id ORDER BY l2_dist2, neighbor_id) AS rank FROM ex)
         |WHERE rank <= 3""".stripMargin
    },

    // SimilarityOps.pqTrainedRecall: the exact columns (counts + the
    // FIXED-codebook recall) replay deterministically; the trained-
    // codebook quality is tolerance-band booleans (k-means centroids
    // are data-dependent floats no SQL oracle can re-derive)
    "pq_trained_recall" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |      WHERE vec_id < 20),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND(${dotSql("c", "c")} - 2.0 * ${dotSql("q", "c")}
         |      + ${dotSql("q", "q")}, 6) AS d
         |   FROM embeddings c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 3),
         |${pqCodedCtes("embeddings", Seq("vec_id"), "t")},
         |pqf AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND($pqAdcSql, 6) AS adc_dist2
         |   FROM codedt c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 3)
         |SELECT CAST(COUNT(DISTINCT ex.query_id) AS BIGINT) AS n_queries,
         | COUNT(*) AS n_exact,
         | CAST((CAST(SUM(CASE WHEN pqf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) * 1000000) // COUNT(*) AS BIGINT) AS recall_fixed_micro,
         | TRUE AS trained_ge_floor,
         | TRUE AS trained_ge_fixed
         |FROM ex
         |LEFT JOIN pqf ON pqf.query_id = ex.query_id
         | AND pqf.neighbor_id = ex.neighbor_id""".stripMargin
    },

    // SimilarityOps.opqTrainedRecall: the exact leg + the FIXED-codebook
    // flat-ADC recall replay deterministically (same CTEs as
    // pq_trained_recall); the trained-PQ and rotated-OPQ legs are
    // data-dependent (k-means + PCA floats) and land as tolerance-band
    // booleans the gate forces to TRUE — the Spark side must PROVE
    // opq ≥ floor and opq ≥ trained-pq or the hash-compare fails.
    "opq_trained_recall" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |      WHERE vec_id < 50),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND(${dotSql("c", "c")} - 2.0 * ${dotSql("q", "c")}
         |      + ${dotSql("q", "q")}, 6) AS d
         |   FROM embeddings c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 5),
         |${pqCodedCtes("embeddings", Seq("vec_id"), "t")},
         |pqf AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND($pqAdcSql, 6) AS adc_dist2
         |   FROM codedt c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 5)
         |SELECT CAST(COUNT(DISTINCT ex.query_id) AS BIGINT) AS n_queries,
         | COUNT(*) AS n_exact,
         | CAST((CAST(SUM(CASE WHEN pqf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) * 1000000) // COUNT(*) AS BIGINT) AS recall_fixed_micro,
         | TRUE AS opq_ge_floor,
         | TRUE AS opq_ge_trained_pq
         |FROM ex
         |LEFT JOIN pqf ON pqf.query_id = ex.query_id
         | AND pqf.neighbor_id = ex.neighbor_id""".stripMargin
    },

    // SimilarityOps.ivfadcTrainedRecall: exact leg + the fixed RESIDUAL
    // IVF-PQ leg replayed (the residual coded/LUT chains); the trained
    // residual-IVFADC quality lands as tolerance-band booleans the gate
    // forces to TRUE (the pq_trained_recall convention).
    "ivfadc_trained_recall" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |      WHERE vec_id < 20),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND(${dotSql("c", "c")} - 2.0 * ${dotSql("q", "c")}
         |      + ${dotSql("q", "q")}, 6) AS d
         |   FROM embeddings c, q WHERE c.vec_id <> q.query_id))
         | WHERE rank <= 3),
         |celled AS ($ivfCelledSelect),
         |${pqResidualCodedCtes("celled", Seq("vec_id", "cell"), "v")},
         |qsrcv AS (SELECT vec_id AS query_id, embedding, cell FROM (
         |  SELECT vec_id, embedding, cell FROM celled WHERE vec_id < 20
         |  UNION ALL
         |  SELECT vec_id, embedding, cell2 AS cell FROM celled WHERE vec_id < 20)),
         |${pqResidualLutCtes("qsrcv", Seq("query_id", "cell"), "v")},
         |pqv AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ROUND($pqResidualAdcSql, 6) AS adc_dist2
         |   FROM codedv c JOIN qlutv q ON c.cell = q.cell AND c.vec_id <> q.query_id))
         | WHERE rank <= 3)
         |SELECT CAST(COUNT(DISTINCT ex.query_id) AS BIGINT) AS n_queries,
         | COUNT(*) AS n_exact,
         | CAST((CAST(SUM(CASE WHEN pqv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) * 1000000) // COUNT(*) AS BIGINT) AS recall_fixed_micro,
         | TRUE AS trained_ge_floor,
         | TRUE AS trained_ge_fixed
         |FROM ex
         |LEFT JOIN pqv ON pqv.query_id = ex.query_id
         | AND pqv.neighbor_id = ex.neighbor_id""".stripMargin
    },

    // MMR greedy unrolled k=5 steps as chained CTEs (the bpe_learn
    // pattern): each step's argmax references only the bounded shortlist
    // and the prior selections, so the recurrence is exact and both
    // engines replay identical rounded doubles
    "mmr_rerank" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      def cosSql(a: String, b: String) =
        s"ROUND(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"
      val k = 5
      val steps = (2 to k).map { i =>
        val prev = (1 until i).map(j => s"SELECT vec_id FROM sel$j")
          .mkString(" UNION ALL ")
        s"""p$i AS ($prev),
           |c$i AS (
           | SELECT c.vec_id, c.rel, MAX(${cosSql("c", "s")}) AS ms
           | FROM cand c JOIN cand s ON s.vec_id IN (SELECT vec_id FROM p$i)
           | WHERE c.vec_id NOT IN (SELECT vec_id FROM p$i)
           | GROUP BY c.vec_id, c.rel),
           |sel$i AS (SELECT vec_id, rel, rel - ms AS mmr_score FROM c$i
           | ORDER BY mmr_score DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val out = (1 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS step, CAST(vec_id AS BIGINT) AS vec_id, rel AS relevance, mmr_score FROM sel$i")
        .mkString("\nUNION ALL ")
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |cand AS (
         | SELECT c.vec_id, c.embedding, ${cosSql("c", "q")} AS rel
         | FROM embeddings c, q WHERE c.vec_id <> 0
         | ORDER BY rel DESC, c.vec_id LIMIT 20),
         |sel1 AS (SELECT vec_id, rel, rel AS mmr_score FROM cand
         | ORDER BY rel DESC, vec_id LIMIT 1),
         |$steps
         |$out""".stripMargin
    },

    "embed_cosine_topk" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH pairs AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ROUND(${dotSql("q", "c")} / (sqrt(${dotSql("q", "q")}) * sqrt(${dotSql("c", "c")})), 6)
         |   AS cosine_sim
         | FROM embeddings q JOIN embeddings c
         |  ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rank
         | FROM pairs)
         |SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5""".stripMargin
    },

    "embed_lsh_ann" -> {
      def planeDot(p: Int) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * (CAST((1103515245 * (${p * 64} + i - 1) + 12345) % 65536 AS DOUBLE) / 65536.0 - 0.5)), (x, y) -> x + y)"
      val bucketExpr = (0 until 16)
        .map(p => s"(CASE WHEN ${planeDot(p)} >= 0.0 THEN (1::BIGINT << $p) ELSE 0 END)")
        .mkString(" + ")
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH b AS (SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings),
         |pairs AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ROUND(${dotSql("q", "c")} / (sqrt(${dotSql("q", "q")}) * sqrt(${dotSql("c", "c")})), 6)
         |   AS cosine_sim
         | FROM b q JOIN b c
         |  ON q.bucket = c.bucket AND q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rank
         | FROM pairs)
         |SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 3""".stripMargin
    },

    "embed_norm_check" -> {
      val dotSelf =
        "list_reduce(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH n AS (SELECT label, $dotSelf AS n2 FROM embeddings)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         | CAST(SUM(CASE WHEN isnan(n2) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
         | CAST(SUM(CASE WHEN n2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         | ROUND(MIN(n2), 6) AS min_norm2,
         | ROUND(MAX(n2), 6) AS max_norm2
         |FROM n GROUP BY label""".stripMargin
    },

    "ann_recall_report" -> {
      def planeDot(p: Int) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * (CAST((1103515245 * (${p * 64} + i - 1) + 12345) % 65536 AS DOUBLE) / 65536.0 - 0.5)), (x, y) -> x + y)"
      val bucketExpr = (0 until 16)
        .map(p => s"(CASE WHEN ${planeDot(p)} >= 0.0 THEN (1::BIGINT << $p) ELSE 0 END)")
        .mkString(" + ")
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      def cosSql(a: String, b: String) =
        s"ROUND(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"
      s"""WITH pairs_e AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${cosSql("q", "c")} AS cosine_sim
         | FROM embeddings q JOIN embeddings c
         |  ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         | SELECT *, row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
         | FROM pairs_e) WHERE rank <= 3),
         |b AS (SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings),
         |pairs_a AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${cosSql("q", "c")} AS cosine_sim
         | FROM b q JOIN b c
         |  ON q.bucket = c.bucket AND q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |ap AS (SELECT query_id, neighbor_id, 1 AS hit_lsh FROM (
         | SELECT *, row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
         | FROM pairs_a) WHERE rank <= 3),
         |celled AS ($ivfCelledSelect),
         |pairs_i AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${cosineSql("q", "c")} AS cosine_sim
         | FROM celled q JOIN celled c
         |  ON (c.cell = q.cell OR c.cell = q.cell2)
         |   AND q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |iv AS (SELECT query_id, neighbor_id, 1 AS hit_ivf FROM (
         | SELECT *, row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
         | FROM pairs_i) WHERE rank <= 3)
         |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
         | CAST(SUM(COALESCE(hit_lsh, 0)) AS BIGINT) AS n_hit_lsh,
         | CAST(SUM(COALESCE(hit_ivf, 0)) AS BIGINT) AS n_hit_ivf,
         | CAST((CAST(SUM(COALESCE(hit_lsh, 0)) AS BIGINT) * 1000000) // COUNT(*)
         |   AS BIGINT) AS recall_lsh_micro,
         | CAST((CAST(SUM(COALESCE(hit_ivf, 0)) AS BIGINT) * 1000000) // COUNT(*)
         |   AS BIGINT) AS recall_ivf_micro
         |FROM ex LEFT JOIN ap USING (query_id, neighbor_id)
         | LEFT JOIN iv USING (query_id, neighbor_id)
         |GROUP BY query_id""".stripMargin
    },

    // SimilarityOps.annNprobeSweep: full per-query cell ranking, one
    // widest-level candidate join, per-level prefix filter, recall vs
    // the brute-force exact top-3 + scan-cost share.
    "ann_nprobe_sweep" -> {
      val distCase = "CASE ks.k " +
        (0 until 16).map(c => s"WHEN $c THEN s$c").mkString(" ") + " END"
      s"""WITH celled AS ($ivfCelledSelect),
         |qc AS (SELECT vec_id AS query_id, embedding, ks.k AS cell,
         |  $distCase AS dist
         | FROM celled, (SELECT unnest(generate_series(0, 15)) AS k) ks
         | WHERE vec_id < 20),
         |qr AS (SELECT query_id, embedding, cell,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY dist, cell) AS BIGINT) AS cell_rank
         | FROM qc),
         |qk AS (SELECT * FROM qr WHERE cell_rank <= 8),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.cell_rank,
         |  ${cosineSql("q", "c")} AS cosine_sim
         | FROM celled c JOIN qk q
         |  ON c.cell = q.cell AND c.vec_id <> q.query_id),
         |probes AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
         |sw AS (SELECT p.nprobe, cand.query_id, cand.neighbor_id,
         |  cand.cosine_sim
         | FROM cand, probes p WHERE cand.cell_rank <= p.nprobe),
         |apk AS (SELECT nprobe, query_id, neighbor_id, 1 AS hit FROM (
         | SELECT *, row_number() OVER (PARTITION BY nprobe, query_id
         |   ORDER BY cosine_sim DESC, neighbor_id) AS rank
         | FROM sw) WHERE rank <= 3),
         |pairs_e AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${cosineSql("q", "c")} AS cosine_sim
         | FROM embeddings q JOIN embeddings c
         |  ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         | SELECT *, row_number() OVER (PARTITION BY query_id
         |   ORDER BY cosine_sim DESC, neighbor_id) AS rank
         | FROM pairs_e) WHERE rank <= 3),
         |hits AS (SELECT p.nprobe, CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(SUM(CASE WHEN a.hit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_hit
         | FROM ex e CROSS JOIN probes p
         | LEFT JOIN apk a ON a.nprobe = p.nprobe
         |  AND a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         | GROUP BY 1),
         |sc AS (SELECT nprobe,
         |  CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         |  CAST(COUNT(*) AS BIGINT) AS scanned FROM sw GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_corpus FROM embeddings)
         |SELECT CAST(sc.nprobe AS BIGINT) AS nprobe, sc.n_queries,
         | sc.scanned,
         | CAST((sc.scanned * 1000000) // (tot.n_corpus * sc.n_queries)
         |   AS BIGINT) AS scanned_share_micro,
         | hits.n_exact, hits.n_hit,
         | CAST((hits.n_hit * 1000000) // hits.n_exact AS BIGINT)
         |   AS recall_micro
         |FROM sc JOIN hits ON sc.nprobe = hits.nprobe, tot""".stripMargin
    },

    "embed_ivf_ann" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |pairs AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${cosineSql("q", "c")} AS cosine_sim
         | FROM celled q JOIN celled c
         |  ON (c.cell = q.cell OR c.cell = q.cell2)
         |   AND q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rank
         | FROM pairs)
         |SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 3""".stripMargin,

    // hard negatives rank ROUNDED cosines (the shared output
    // convention) so ties break identically; easy negative is the
    // hash-argmin outside the anchor's probed cells
    "contrastive_pairs" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |anc AS (SELECT vec_id AS anchor_id, embedding,
         |  cell AS a_cell, cell2 AS a_cell2
         | FROM celled WHERE vec_id < 20),
         |h0 AS (SELECT anc.anchor_id, c.vec_id AS other_id,
         |  ${cosineSql("anc", "c")} AS cosine_sim
         | FROM celled c JOIN anc
         |  ON c.cell = anc.a_cell AND c.vec_id <> anc.anchor_id),
         |h1 AS (SELECT anchor_id, other_id, cosine_sim,
         |  CAST(row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cosine_sim DESC, other_id) AS BIGINT) AS rank
         | FROM h0 WHERE cosine_sim < 0.99),
         |hard AS (SELECT anchor_id, 'hard_neg' AS pair_type, other_id,
         |  cosine_sim, rank FROM h1 WHERE rank <= 2),
         |e0 AS (SELECT anc.anchor_id, c.vec_id AS other_id,
         |  ${cosineSql("anc", "c")} AS cosine_sim,
         |  ('0x' || substr(md5(anc.anchor_id || ':' || c.vec_id), 1, 15))::BIGINT
         |    AS pick
         | FROM celled c JOIN anc
         |  ON c.cell <> anc.a_cell AND c.cell <> anc.a_cell2),
         |e1 AS (SELECT anchor_id, other_id, cosine_sim,
         |  CAST(row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY pick, other_id) AS BIGINT) AS rank FROM e0),
         |easy AS (SELECT anchor_id, 'easy_neg' AS pair_type, other_id,
         |  cosine_sim, rank FROM e1 WHERE rank = 1)
         |SELECT * FROM hard UNION ALL SELECT * FROM easy""".stripMargin,

    "dedup_semantic" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |rem AS (
         | SELECT DISTINCT q.vec_id
         | FROM celled p JOIN celled q
         |  ON p.cell = q.cell AND p.vec_id < q.vec_id
         | WHERE ${cosineSql("p", "q")} >= 0.99)
         |SELECT c.vec_id, c.cell, (rem.vec_id IS NOT NULL) AS is_removed
         |FROM celled c LEFT JOIN rem ON c.vec_id = rem.vec_id""".stripMargin,

    "embed_quantize" ->
      """WITH ex AS (
        | SELECT vec_id, g.i - 1 AS i, embedding[g.i]::DOUBLE AS v
        | FROM embeddings, unnest(generate_series(1, 64)) AS g(i)),
        |dims AS (SELECT i, MIN(v) AS mn, MAX(v) AS mx,
        |  (MAX(v) - MIN(v)) / 255.0 AS scale FROM ex GROUP BY i),
        |coded AS (SELECT vec_id, ex.i,
        |  CASE WHEN scale = 0.0 THEN 0
        |       ELSE CAST(ROUND((v - mn) / scale) AS INT) END AS q,
        |  abs(v - (mn + (CASE WHEN scale = 0.0 THEN 0
        |       ELSE CAST(ROUND((v - mn) / scale) AS INT) END) * scale)) AS err
        | FROM ex JOIN dims ON ex.i = dims.i)
        |SELECT vec_id, string_agg(q::VARCHAR, ',' ORDER BY i) AS q_codes,
        | ROUND(MAX(err), 6) AS max_err
        |FROM coded GROUP BY vec_id""".stripMargin,

    "embed_knn_label" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |pairs AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${cosineSql("q", "c")} AS cosine_sim
         | FROM celled q JOIN celled c
         |  ON (c.cell = q.cell OR c.cell = q.cell2)
         |   AND q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
         | FROM pairs),
         |votes AS (
         | SELECT query_id, lang, CAST(COUNT(*) AS BIGINT) AS n_votes
         | FROM ranked JOIN documents ON neighbor_id = doc_id
         | WHERE rank <= 5 GROUP BY query_id, lang),
         |top AS (SELECT *, row_number() OVER (
         |  PARTITION BY query_id ORDER BY n_votes DESC, lang) AS vr FROM votes)
         |SELECT query_id, top.lang AS predicted_lang, n_votes,
         | d.lang AS actual_lang, (top.lang = d.lang) AS is_correct
         |FROM top JOIN documents d ON query_id = d.doc_id
         |WHERE vr = 1""".stripMargin,

    "inverted_index" ->
      s"""WITH toks AS (
         | SELECT doc_id, unnest(string_split(${norm("text")}, ' ')) AS tok
         | FROM documents WHERE length(${norm("text")}) > 0),
         |per_doc AS (
         | SELECT tok, doc_id, COUNT(*) AS n FROM toks GROUP BY tok, doc_id)
         |SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
         | CAST(SUM(n) AS BIGINT) AS tf,
         | array_to_string(
         |   list_slice(list(doc_id::VARCHAR ORDER BY doc_id), 1, 5), ',')
         |   AS posting_sample
         |FROM per_doc GROUP BY tok""".stripMargin,

    "bpe_pair_counts" ->
      s"""WITH w AS (
         | SELECT unnest(string_split(${norm("text")}, ' ')) AS word
         | FROM documents WHERE length(${norm("text")}) > 0),
         |wc AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
         |p AS (
         | SELECT substring(word, i, 2) AS pair, n
         | FROM wc, unnest(generate_series(1, length(word) - 1)) AS u(i)
         | WHERE length(word) >= 2)
         |SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
         |FROM p GROUP BY pair
         |ORDER BY pair_count DESC, pair LIMIT 20""".stripMargin,

    "dedup_embed_cosine" -> {
      def planeDot(p: Int) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * (CAST((1103515245 * (${p * 64} + i - 1) + 12345) % 65536 AS DOUBLE) / 65536.0 - 0.5)), (x, y) -> x + y)"
      val bucketExpr = (0 until 16)
        .map(p => s"(CASE WHEN ${planeDot(p)} >= 0.0 THEN (1::BIGINT << $p) ELSE 0 END)")
        .mkString(" + ")
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH b AS (SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings)
         |SELECT * FROM (
         | SELECT p.vec_id AS vec_a, q.vec_id AS vec_b,
         |  ROUND(${dotSql("p", "q")} / (sqrt(${dotSql("p", "p")}) * sqrt(${dotSql("q", "q")})), 6)
         |   AS cosine_sim
         | FROM b p JOIN b q ON p.bucket = q.bucket AND p.vec_id < q.vec_id)
         |WHERE cosine_sim >= 0.99""".stripMargin
    },

    "top_customers_per_nation" ->
      """WITH by_cust AS (
        | SELECT n_name AS nation, c_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue_exact
        | FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name, c_custkey)
        |SELECT nation, c_custkey,
        | ROUND(CAST(revenue_exact AS DOUBLE), 2) AS revenue, rank
        |FROM (
        | SELECT nation, c_custkey, revenue_exact,
        |  CAST(row_number() OVER (PARTITION BY nation
        |    ORDER BY revenue_exact DESC, c_custkey) AS BIGINT) AS rank
        | FROM by_cust)
        |WHERE rank <= 3""".stripMargin,

    "rolling_order_volume" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS n_orders
        | FROM orders GROUP BY 1),
        |d2 AS (SELECT *, date_diff('day', DATE '1970-01-01', order_date) AS epoch_day
        | FROM daily)
        |SELECT order_date, n_orders,
        | ROUND(CAST(SUM(n_orders) OVER w AS DOUBLE)
        |   / CAST(COUNT(*) OVER w AS DOUBLE), 4) AS avg_7d
        |FROM d2
        |WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "status_pivot_by_region" ->
      """SELECT r_name AS region,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "revenue_rollup" ->
      """SELECT n_name AS nation, c_mktsegment AS segment, COUNT(*) AS n_orders,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin,

    "lang_id" -> langIdSql,

    "lang_confusion" ->
      s"""WITH li AS ($langIdSql),
         |g AS (
         | SELECT lang AS actual_lang, predicted_lang,
         |  CAST(COUNT(*) AS BIGINT) AS n
         | FROM li GROUP BY 1, 2),
         |w AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY actual_lang) AS BIGINT)
         |  AS actual_total FROM g)
         |SELECT actual_lang, predicted_lang, n,
         | CAST((n * 1000000) // actual_total AS BIGINT) AS share_micro
         |FROM w""".stripMargin,

    "quality_score" -> qualityScoreSql,

    "token_count" ->
      s"""SELECT doc_id,
         | CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |      ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS n_ws_tokens,
         | CAST(len(regexp_extract_all(${norm("text")}, '[a-z0-9]+')) AS BIGINT)
         |   AS n_alnum_runs,
         | CAST(length(replace(${norm("text")}, ' ', '')) AS BIGINT) AS n_chars_nospace
         |FROM documents""".stripMargin,

    "type_token_ratio" ->
      s"""SELECT doc_id, n_tokens, n_distinct,
         | ROUND(CAST(n_distinct AS DOUBLE) / GREATEST(n_tokens, 1), 4) AS ttr,
         | ROUND(CAST(n_distinct AS DOUBLE) / GREATEST(n_tokens, 1), 4) < 0.3
         |   AS is_repetitive
         |FROM (SELECT doc_id,
         | CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |      ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS n_tokens,
         | CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |      ELSE len(list_distinct(string_split(${norm("text")}, ' '))) END AS BIGINT)
         |   AS n_distinct
         |FROM documents)""".stripMargin,

    "stratified_sample" -> stratifiedSampleSql,

    "weighted_sample" ->
      s"""WITH b AS (
         | SELECT doc_id,
         |  CAST(length(${norm("text")}) AS BIGINT) AS weight_chars,
         |  ${hash32Sql(s"'${graft.operators.PipelineOps.WeightSalt}' || CAST(doc_id AS VARCHAR)")} AS h
         | FROM documents WHERE length(${norm("text")}) > 0)
         |SELECT doc_id, weight_chars,
         | CAST((h * 1000000) // weight_chars AS BIGINT) AS priority_micro
         |FROM b ORDER BY priority_micro, doc_id LIMIT 50""".stripMargin,

    "collocation_pmi" ->
      s"""WITH t AS (
         | SELECT string_split(${norm("text")}, ' ') AS ts
         | FROM documents WHERE length(${norm("text")}) > 0),
         |pr AS (
         | SELECT ts[i] AS lhs, ts[i + 1] AS rhs
         | FROM t, unnest(generate_series(1, len(ts) - 1)) AS u(i)
         | WHERE len(ts) >= 2),
         |pc AS (
         | SELECT lhs, rhs, COUNT(*) AS n_ab FROM pr GROUP BY 1, 2
         | HAVING COUNT(*) >= 3),
         |uni AS (
         | SELECT unnest(ts) AS tok FROM t),
         |uc AS (SELECT tok, COUNT(*) AS tf FROM uni GROUP BY tok),
         |tot AS (SELECT COUNT(*) AS n_total FROM pr)
         |SELECT lhs, rhs, CAST(n_ab AS BIGINT) AS n_ab,
         | CAST(a.tf AS BIGINT) AS n_a, CAST(b.tf AS BIGINT) AS n_b,
         | CAST((CAST(n_ab AS HUGEINT) * n_total * 1000000)
         |   // (CAST(a.tf AS HUGEINT) * b.tf) AS BIGINT) AS lift_micro
         |FROM pc
         | JOIN uc a ON a.tok = pc.lhs
         | JOIN uc b ON b.tok = pc.rhs
         | CROSS JOIN tot
         |ORDER BY lift_micro DESC, lhs, rhs LIMIT 30""".stripMargin,

    "source_cap_sample" ->
      s"""SELECT doc_id, source, cap_rank FROM (
         | SELECT doc_id, source,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY source
         |   ORDER BY ${hash32Sql(s"'${graft.operators.PipelineOps.CapSalt}' || CAST(doc_id AS VARCHAR)")}, doc_id)
         |   AS BIGINT) AS cap_rank
         | FROM documents)
         |WHERE cap_rank <= 10""".stripMargin,

    "dataset_split" ->
      s"""WITH b AS (
         | SELECT lang,
         |  ${hash32Sql(s"'${graft.operators.PipelineOps.SplitSalt}' || CAST(doc_id AS VARCHAR)")} % 100
         |    AS h,
         |  CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |       ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS ntok
         | FROM documents),
         |g AS (
         | SELECT lang,
         |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, SUM(ntok) AS n_tokens
         | FROM b GROUP BY 1, 2)
         |SELECT lang, split, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
         | CAST((n_docs * 1000000) //
         |   (SUM(n_docs) OVER (PARTITION BY lang)) AS BIGINT) AS doc_share_micro
         |FROM g""".stripMargin,

    "quality_gate" ->
      s"""WITH q AS ($qualityScoreSql)
         |SELECT doc_id, quality_score,
         | $gateReasonSql AS reject_reason,
         | reject_reason IS NULL AS keep
         |FROM q""".stripMargin,

    "quality_classifier_score" -> {
      val wq = graft.operators.ClassifierOps.FixedWeightsMicro
      val off = graft.operators.ClassifierOps.BucketOffset
      val div = graft.operators.ClassifierOps.BucketDiv
      s"""WITH q AS ($qualityScoreSql),
         |f AS (SELECT
         |  CAST(LEAST(COALESCE(n_tokens, 0), 500) * 20 AS BIGINT) AS f_len,
         |  CAST(COALESCE(ROUND(special_ratio * 10000), 0) AS BIGINT) AS f_special,
         |  CAST(COALESCE(ROUND(stop_ratio * 10000), 0) AS BIGINT) AS f_stop,
         |  LEAST(COALESCE(CAST(ROUND(avg_word_len * 10000) AS BIGINT), 0),
         |    200000) // 20 AS f_awl,
         |  ($gateReasonSql) IS NULL AS y
         | FROM q),
         |s AS (SELECT (${wq(0)}::BIGINT * 10000 + ${wq(1)}::BIGINT * f_len
         |  + ${wq(2)}::BIGINT * f_special + ${wq(3)}::BIGINT * f_stop
         |  + ${wq(4)}::BIGINT * f_awl + $off) // $div AS s, y FROM f),
         |g AS (SELECT s, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS np,
         |  SUM(CASE WHEN y THEN 0 ELSE 1 END) AS nn FROM s GROUP BY s),
         |c AS (SELECT np, nn, COALESCE(SUM(nn) OVER (ORDER BY s
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
         | FROM g),
         |a AS (SELECT CAST((SUM(np * (2 * cumneg + nn)) * 1000000)
         |  // (2 * SUM(np) * SUM(nn)) AS BIGINT) AS auc_fixed_micro FROM c),
         |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         | FROM f)
         |SELECT n_docs, n_keep, n_docs - n_keep AS n_drop, auc_fixed_micro,
         | TRUE AS trained_auc_ge_floor, TRUE AS trained_ge_fixed
         |FROM cnt, a""".stripMargin
    },

    "mixture_cube" ->
      s"""WITH t AS (SELECT lang, source,
         |  CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |       ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS n
         | FROM documents)
         |SELECT lang, source, COUNT(*) AS n_docs,
         | CAST(SUM(n) AS BIGINT) AS n_tokens
         |FROM t GROUP BY CUBE (lang, source)""".stripMargin,

    "mixture_report" ->
      s"""WITH t AS (SELECT lang,
         |  CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |       ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS n
         | FROM documents),
         |g AS (SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
         |      FROM t GROUP BY lang)
         |SELECT lang, n_docs, n_tokens,
         | ROUND(CAST(n_tokens AS DOUBLE) * CAST(100.0 AS DOUBLE)
         |   / CAST(CAST(SUM(n_tokens) OVER () AS BIGINT) AS DOUBLE), 4)
         |   AS token_share_pct
         |FROM g""".stripMargin,

    "mixture_balance" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |       ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS n
         | FROM documents),
         |g AS (SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
         |      FROM t GROUP BY lang),
         |m AS (SELECT MIN(n_tokens) AS min_tokens FROM g),
         |r AS (SELECT lang, n_docs, n_tokens,
         |  CAST(FLOOR((100.0 * CAST(min_tokens AS DOUBLE))
         |    / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS keep_rate_pct
         | FROM g CROSS JOIN m),
         |k AS (SELECT lang, COUNT(*) AS kept_docs, CAST(SUM(n) AS BIGINT) AS kept_tokens
         | FROM t JOIN r USING (lang)
         | WHERE ${hash32Sql(s"'${graft.operators.PipelineOps.BalanceSalt}' || CAST(doc_id AS VARCHAR)")} % 100 < keep_rate_pct
         | GROUP BY lang)
         |SELECT lang, n_docs, n_tokens, keep_rate_pct,
         | COALESCE(kept_docs, 0) AS kept_docs,
         | COALESCE(kept_tokens, 0) AS kept_tokens,
         | ROUND((CAST(COALESCE(kept_tokens, 0) AS DOUBLE) * 100.0)
         |   / CAST(n_tokens AS DOUBLE), 4) AS realized_pct
         |FROM r LEFT JOIN k USING (lang)""".stripMargin,

    "token_pack" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
         |  CAST(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |       ELSE len(string_split(${norm("text")}, ' ')) END AS BIGINT) AS n_tokens
         | FROM documents),
         |c AS (SELECT doc_id, lang, source, n_tokens,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         | FROM t)
         |SELECT doc_id, lang, source, n_tokens,
         | lang || '/' || source || '/' ||
         |   CAST((cum - n_tokens) // ${graft.operators.PipelineOps.PackBudget} AS VARCHAR)
         |   AS pack_id,
         | (cum - n_tokens) % ${graft.operators.PipelineOps.PackBudget} AS pack_offset
         |FROM c""".stripMargin,

    "doc_chunk" -> {
      val c = graft.operators.PipelineOps.ChunkTokens
      val s = graft.operators.PipelineOps.ChunkStride
      s"""WITH d AS (SELECT doc_id, string_split(${norm("text")}, ' ') AS ts
         |  FROM documents WHERE length(${norm("text")}) > 0)
         |SELECT doc_id, start_tok // $s AS chunk_id, start_tok,
         | CAST(LEAST($c, len(ts) - start_tok) AS BIGINT) AS chunk_tokens,
         | array_to_string(ts[start_tok + 1 : start_tok + $c], ' ') AS chunk_text
         |FROM (SELECT doc_id, ts,
         |  unnest(generate_series(0, len(ts) - 1, $s)) AS start_tok FROM d)""".stripMargin
    },

    "vocab_coverage" ->
      s"""WITH t AS (SELECT tok, COUNT(*) AS tf FROM (
         |  SELECT unnest(string_split(${norm("text")}, ' ')) AS tok
         |  FROM documents WHERE length(${norm("text")}) > 0)
         | GROUP BY tok)
         |SELECT tok, tf,
         | CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS BIGINT) AS rank,
         | ROUND(CAST(CAST(SUM(tf) OVER (ORDER BY tf DESC, tok
         |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
         |   * CAST(100.0 AS DOUBLE)
         |   / CAST(CAST(SUM(tf) OVER () AS BIGINT) AS DOUBLE), 4)
         |   AS cum_coverage_pct
         |FROM t""".stripMargin,

    "doc_fingerprint" ->
      s"""SELECT doc_id, ${hash60Sql(norm("text"))} AS fingerprint,
         | COUNT(*) OVER (PARTITION BY ${hash60Sql(norm("text"))}) AS n_same_fp
         |FROM documents""".stripMargin,

    "pii_redact" -> {
      import graft.operators.TextOps.{PiiEmail, PiiPhone, PiiIp}
      s"""WITH dirty AS (
         | SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact agent'
         |        || CAST(doc_id AS VARCHAR) || '@example.com now'
         |       WHEN doc_id % 5 = 1 THEN text || ' call 555-'
         |        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
         |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
         |       WHEN doc_id % 5 = 2 THEN text || ' server 10.'
         |        || CAST(doc_id % 256 AS VARCHAR) || '.0.'
         |        || CAST(doc_id % 200 + 1 AS VARCHAR) || ' logged'
         |       ELSE text END AS text
         | FROM documents),
         |red AS (SELECT doc_id, text,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$PiiEmail', '<EMAIL>', 'g'),
         |    '$PiiIp', '<IP>', 'g'),
         |    '$PiiPhone', '<PHONE>', 'g') AS r
         | FROM dirty)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '$PiiEmail')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(text, '$PiiPhone')) AS BIGINT) AS n_phones,
         | CAST(len(regexp_extract_all(text, '$PiiIp')) AS BIGINT) AS n_ips,
         | md5(r) AS redacted_hash,
         | CAST(length(r) AS BIGINT) AS redacted_len,
         | len(regexp_extract_all(text, '$PiiEmail'))
         |  + len(regexp_extract_all(text, '$PiiPhone'))
         |  + len(regexp_extract_all(text, '$PiiIp')) > 0 AS has_pii
         |FROM red""".stripMargin
    },

    "multimodal_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CAST(64 + octet_length(encode(text)) % 64 AS INT) AS width,
        | CAST(64 + (octet_length(encode(text)) * 7) % 64 AS INT) AS height,
        | CAST(1 + octet_length(encode(text)) % 30 AS INT) AS frames,
        | md5(text) AS checksum
        |FROM documents""".stripMargin,

    "multimodal_dedup" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  md5(text) AS checksum,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        | FROM documents)
        |SELECT media_type, checksum,
        | CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
        | CAST(COUNT(*) AS BIGINT) AS n_copies,
        | CAST(MAX(byte_len) * (COUNT(*) - 1) AS BIGINT) AS wasted_bytes
        |FROM m GROUP BY 1, 2
        |HAVING COUNT(*) >= 2""".stripMargin,

    // blockhash60 over the utf-8 payload, replayed byte-for-byte: the
    // testdata text is pure ASCII (octet_length == length, asserted by
    // the Spark side's encode), so ord(substr) IS the payload byte
    "multimodal_near_dedup" ->
      """WITH m AS MATERIALIZED (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  md5(text) AS checksum, text,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS len
        | FROM documents
        | WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
        |blk AS (
        | SELECT doc_id, ((i - 1) * 60) // len AS b,
        |  SUM(CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)) AS s
        | FROM (SELECT doc_id, len, text,
        |    UNNEST(generate_series(1, len)) AS i FROM m)
        | GROUP BY doc_id, ((i - 1) * 60) // len),
        |tot AS (SELECT doc_id, SUM(s) AS total FROM blk GROUP BY doc_id),
        |fp AS (
        | SELECT blk.doc_id,
        |  CAST(SUM(CASE WHEN s * 60 > total
        |    THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS fp
        | FROM blk JOIN tot ON blk.doc_id = tot.doc_id GROUP BY blk.doc_id),
        |fm AS MATERIALIZED (
        | SELECT m.doc_id, media_type, checksum, fp.fp
        | FROM m JOIN fp ON m.doc_id = fp.doc_id),
        |bands AS (
        | SELECT doc_id, media_type, checksum, fp, band,
        |  (fp >> (band * 15)) & 32767 AS key
        | FROM fm, (VALUES (0), (1), (2), (3)) AS bb(band))
        |SELECT * FROM (
        | SELECT DISTINCT a.media_type, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming,
        |  a.checksum = b.checksum AS is_exact_dup
        | FROM bands a JOIN bands b
        |  ON a.media_type = b.media_type AND a.band = b.band
        |   AND a.key = b.key AND a.doc_id < b.doc_id)
        |WHERE hamming <= 3""".stripMargin
  )

  private val dExtras: Map[String, String] = Map(
    // TextOps.ngramNovelty: per-doc first-seen span-occurrence fraction
    // (novelty in ingestion order) over the same span-hash stream the
    // span dedups use.
    "ngram_novelty" -> {
      val span = graft.operators.DedupOps.SpanTokens
      s"""WITH d AS (SELECT doc_id, string_split(${norm("text")}, ' ') AS ts
         |  FROM documents WHERE length(${norm("text")}) > 0),
         |g AS (SELECT doc_id,
         |  ${hash32Sql(s"array_to_string(ts[i:i+${span - 1}], ' ')")} AS h
         | FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-${span - 1})) AS i
         |       FROM d WHERE len(ts) >= $span)),
         |f AS (SELECT h, MIN(doc_id) AS first_doc FROM g GROUP BY h)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         | CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_first_seen,
         | CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000
         |   // COUNT(*) AS BIGINT) AS novelty_micro
         |FROM g JOIN f USING (h)
         |GROUP BY doc_id""".stripMargin
    },

    // TextOps.heapsLaw: vocabulary-growth curve over 20 equal-width
    // doc_id buckets; first occurrence = min bucket per token.
    "heaps_law" ->
      s"""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
         |d AS (SELECT doc_id, (doc_id * 20) // (mx + 1) AS bucket,
         |  ${norm("text")} AS nt FROM documents CROSS JOIN mx),
         |t AS (SELECT bucket, unnest(string_split(nt, ' ')) AS tok
         | FROM d WHERE length(nt) > 0),
         |pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
         | FROM d GROUP BY bucket),
         |tm AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
         | FROM t GROUP BY bucket),
         |vn AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS vocab_new
         | FROM (SELECT tok, MIN(bucket) AS bucket FROM t GROUP BY tok)
         | GROUP BY bucket),
         |j AS (SELECT pb.bucket, n_docs, COALESCE(n_tokens, 0) AS n_tokens,
         |  COALESCE(vocab_new, 0) AS vocab_new
         | FROM pb LEFT JOIN tm ON pb.bucket = tm.bucket
         |  LEFT JOIN vn ON pb.bucket = vn.bucket)
         |SELECT bucket, n_docs, n_tokens, vocab_new,
         | CAST(SUM(n_tokens) OVER (ORDER BY bucket
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS cum_tokens,
         | CAST(SUM(vocab_new) OVER (ORDER BY bucket
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS cum_vocab
         |FROM j""".stripMargin,

    // MultimodalOps.multimodalDedupClusters: connected components over
    // the blockhash band-pair graph (min-id representative), per-cluster
    // byte accounting. The fingerprint chain mirrors
    // multimodal_near_dedup's oracle; CC is the same recursive-reach
    // shape as dedup_survivors'.
    "multimodal_dedup_clusters" ->
      """WITH RECURSIVE m AS MATERIALIZED (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  md5(text) AS checksum, text,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS len
        | FROM documents
        | WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
        |blk AS (
        | SELECT doc_id, ((i - 1) * 60) // len AS b,
        |  SUM(CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)) AS s
        | FROM (SELECT doc_id, len, text,
        |    UNNEST(generate_series(1, len)) AS i FROM m)
        | GROUP BY doc_id, ((i - 1) * 60) // len),
        |tot AS (SELECT doc_id, SUM(s) AS total FROM blk GROUP BY doc_id),
        |fp AS (
        | SELECT blk.doc_id,
        |  CAST(SUM(CASE WHEN s * 60 > total
        |    THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS fp
        | FROM blk JOIN tot ON blk.doc_id = tot.doc_id GROUP BY blk.doc_id),
        |fm AS MATERIALIZED (
        | SELECT m.doc_id, media_type, fp.fp
        | FROM m JOIN fp ON m.doc_id = fp.doc_id),
        |bands AS (
        | SELECT doc_id, media_type, fp, band,
        |  (fp >> (band * 15)) & 32767 AS key
        | FROM fm, (VALUES (0), (1), (2), (3)) AS bb(band)),
        |mmp AS MATERIALIZED (SELECT * FROM (
        | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        | FROM bands a JOIN bands b
        |  ON a.media_type = b.media_type AND a.band = b.band
        |   AND a.key = b.key AND a.doc_id < b.doc_id)
        |WHERE hamming <= 3),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mmp
        |          UNION SELECT doc_b, doc_a FROM mmp),
        |reach AS (SELECT DISTINCT src AS node, src AS lbl FROM edges
        |          UNION
        |          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        |lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
        |        FROM reach GROUP BY node)
        |SELECT media_type, cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        | CAST(SUM(len) AS BIGINT) AS bytes_total,
        | CAST(SUM(CASE WHEN lab.doc_id = cluster_id THEN 0 ELSE len END)
        |   AS BIGINT) AS bytes_wasted
        |FROM lab JOIN m ON lab.doc_id = m.doc_id
        |GROUP BY media_type, cluster_id""".stripMargin,

    // DedupOps.dedupCascade: first-stage removal attribution across
    // exact → MinHash-LSH → SimHash (lower-id removal rule each stage).
    "dedup_cascade" ->
      s"""WITH $minhashPairsCte,
         |$simhashPairsCte,
         |exr AS (SELECT doc_id FROM (
         |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(t)) AS m
         |  FROM norm) WHERE doc_id > m),
         |mhr AS (SELECT DISTINCT doc_b AS doc_id FROM lshp),
         |shr AS (SELECT DISTINCT doc_b AS doc_id FROM shp),
         |cbase AS (SELECT doc_id,
         |  CAST(CASE WHEN length(t) = 0 THEN 0
         |       ELSE len(string_split(t, ' ')) END AS BIGINT) AS ntok
         | FROM norm),
         |st AS (SELECT b.doc_id, b.ntok,
         |  CASE WHEN e.doc_id IS NOT NULL THEN '1_exact'
         |       WHEN m.doc_id IS NOT NULL THEN '2_minhash_lsh'
         |       WHEN s.doc_id IS NOT NULL THEN '3_simhash'
         |       ELSE 'kept' END AS stage
         | FROM cbase b
         |  LEFT JOIN exr e ON b.doc_id = e.doc_id
         |  LEFT JOIN mhr m ON b.doc_id = m.doc_id
         |  LEFT JOIN shr s ON b.doc_id = s.doc_id),
         |ctot AS (SELECT COUNT(*) AS n_total FROM cbase)
         |SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(ntok) AS BIGINT) AS n_tokens,
         | CAST(COUNT(*) * 1000000 // n_total AS BIGINT) AS doc_share_micro
         |FROM st CROSS JOIN ctot
         |GROUP BY stage, n_total""".stripMargin,

    // PipelineOps.curriculumPhases: quality-ranked token-budget phases
    // via the quantized-score CDF (tie groups land whole).
    "curriculum_phases" ->
      s"""WITH q AS ($qualityScoreSql),
         |s AS (SELECT CAST(ROUND(quality_score * 10000) AS BIGINT) AS score_q,
         |  n_tokens FROM q),
         |bs AS (SELECT score_q, CAST(COUNT(*) AS BIGINT) AS nd,
         |  CAST(SUM(n_tokens) AS BIGINT) AS nt FROM s GROUP BY score_q),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS ttot FROM s),
         |c AS (SELECT score_q, nd, nt,
         |  CAST(COALESCE(SUM(nt) OVER (ORDER BY score_q DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before, ttot
         | FROM bs CROSS JOIN tot)
         |SELECT phase, CAST(SUM(nd) AS BIGINT) AS n_docs,
         | CAST(SUM(nt) AS BIGINT) AS n_tokens,
         | CAST(MAX(score_q) AS BIGINT) AS max_score_q,
         | CAST(MIN(score_q) AS BIGINT) AS min_score_q
         |FROM (SELECT CAST(LEAST((cum_before * 3) // GREATEST(ttot, 1), 2)
         |        AS BIGINT) AS phase, nd, nt, score_q FROM c)
         |GROUP BY phase""".stripMargin,

    // StatOps.rankCorrQualityLength: exact Kendall tau-b on the bounded
    // (score bin x log2-length bin) contingency table.
    "rank_corr_quality_len" ->
      s"""WITH q AS ($qualityScoreSql),
         |s AS (SELECT CAST(ROUND(quality_score * 10000) AS BIGINT) // 500 AS x,
         |  CAST(length(bin(GREATEST(n_chars, 1))) - 1 AS BIGINT) AS y FROM q),
         |cl AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY x, y),
         |cd AS (SELECT
         |  COALESCE(SUM(CASE WHEN b.x < a.x AND b.y < a.y
         |    THEN a.n * b.n END), 0) AS c,
         |  COALESCE(SUM(CASE WHEN b.x < a.x AND b.y > a.y
         |    THEN a.n * b.n END), 0) AS d
         | FROM cl a CROSS JOIN cl b),
         |tx AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS tx2
         | FROM (SELECT SUM(n) AS t FROM cl GROUP BY x)),
         |ty AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS ty2
         | FROM (SELECT SUM(n) AS t FROM cl GROUP BY y)),
         |tt AS (SELECT SUM(n) AS nn FROM cl),
         |nb AS (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x_bins,
         |  CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y_bins FROM cl)
         |SELECT CAST(nn AS BIGINT) AS n_docs, n_x_bins, n_y_bins,
         | ROUND(CASE WHEN nn * (nn - 1) = tx2 OR nn * (nn - 1) = ty2 THEN NULL
         |   ELSE CAST(c - d AS DOUBLE) /
         |     (sqrt(CAST(nn * (nn - 1) - tx2 AS DOUBLE) / 2.0)
         |      * sqrt(CAST(nn * (nn - 1) - ty2 AS DOUBLE) / 2.0)) END, 6)
         |   AS tau_b_r6
         |FROM tt CROSS JOIN cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN nb""".stripMargin,

    // SimilarityOps.embedClipBounds: exact per-dim p1/p99 via the
    // milli-quantized value-domain CDF + strictly-outside mass.
    "embed_clip_bounds" ->
      """WITH v AS (
        | SELECT d.dim AS dim,
        |  CAST(TRUNC(embedding[d.dim]::DOUBLE * 1000) AS BIGINT) AS milli
        | FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS dim) d
        | WHERE embedding IS NOT NULL AND NOT isnan(embedding[d.dim]::DOUBLE)),
        |cl AS (SELECT dim, milli, CAST(COUNT(*) AS BIGINT) AS cnt
        | FROM v GROUP BY dim, milli),
        |np AS (SELECT dim, CAST(SUM(cnt) AS BIGINT) AS n_vals
        | FROM cl GROUP BY dim),
        |cm AS (SELECT dim, milli, cnt,
        |  CAST(SUM(cnt) OVER (PARTITION BY dim ORDER BY milli
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM cl),
        |r AS (SELECT cm.dim, milli, cnt, cum, n_vals
        | FROM cm JOIN np ON cm.dim = np.dim),
        |lo AS (SELECT dim, MIN(milli) AS lo_milli FROM r
        | WHERE cum >= (n_vals + 99) // 100 GROUP BY dim),
        |hi AS (SELECT dim, MIN(milli) AS hi_milli FROM r
        | WHERE cum >= (n_vals * 99 + 99) // 100 GROUP BY dim),
        |cp AS (SELECT cl.dim,
        |  CAST(SUM(CASE WHEN milli < lo_milli THEN cnt ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(SUM(CASE WHEN milli > hi_milli THEN cnt ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi
        | FROM cl JOIN lo ON cl.dim = lo.dim JOIN hi ON cl.dim = hi.dim
        | GROUP BY cl.dim)
        |SELECT CAST(np.dim AS BIGINT) AS dim, n_vals, lo_milli, hi_milli,
        | n_clip_lo, n_clip_hi
        |FROM np JOIN lo ON np.dim = lo.dim JOIN hi ON np.dim = hi.dim
        | JOIN cp ON np.dim = cp.dim""".stripMargin,

    // AsOfOps.errorClickContext: per-error preceding-window click
    // context (the oracle states the range join directly; Spark executes
    // the banded equi rewrite of the same predicate).
    "error_click_context" ->
      """WITH base AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type, value
        | FROM events),
        |err AS (SELECT user_id, event_id, ts_s FROM base
        | WHERE event_type = 'error'),
        |clk AS (SELECT user_id, ts_s AS c_ts,
        |  CAST(ROUND(value * 100) AS BIGINT) AS c_cents FROM base
        | WHERE event_type = 'click'),
        |m AS (SELECT e.event_id, CAST(COUNT(*) AS BIGINT) AS n_clicks,
        |  CAST(SUM(c_cents) AS BIGINT) AS cents
        | FROM err e JOIN clk c ON e.user_id = c.user_id
        |  AND c.c_ts >= e.ts_s - 600 AND c.c_ts < e.ts_s
        | GROUP BY e.event_id)
        |SELECT e.event_id, e.user_id, e.ts_s,
        | COALESCE(n_clicks, 0) AS n_clicks,
        | COALESCE(cents, 0) AS clicks_cents
        |FROM err e LEFT JOIN m ON e.event_id = m.event_id""".stripMargin,

    // TextOps.gateSoleReason: docs failing exactly one gate rule, by
    // rule — the marginal (ablation) attribution next to quality_gate's
    // first-failing one. Rule predicates are gateReasonSql's, evaluated
    // independently with explicit NULL-to-false coalescing both engines
    // share.
    "gate_sole_reason" ->
      s"""WITH q AS ($qualityScoreSql),
         |f AS (SELECT
         |  (n_tokens IS NULL OR n_tokens < 15) AS f_short,
         |  COALESCE(special_ratio > 0.05, FALSE) AS f_special,
         |  COALESCE(stop_ratio < 0.08, FALSE) AS f_stop,
         |  COALESCE(avg_word_len < 3.0 OR avg_word_len > 10.0, FALSE) AS f_awl,
         |  COALESCE(n_tokens, 0) AS ntok
         | FROM q),
         |ff AS (SELECT f_short, f_special, f_stop, f_awl, ntok,
         |  CAST(f_short AS BIGINT) + CAST(f_special AS BIGINT)
         |   + CAST(f_stop AS BIGINT) + CAST(f_awl AS BIGINT) AS n_fail
         | FROM f),
         |fl AS (SELECT * FROM ff WHERE n_fail >= 1),
         |tot AS (SELECT COUNT(*) AS n_rejected FROM fl)
         |SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_sole_docs,
         | CAST(SUM(ntok) AS BIGINT) AS n_sole_tokens,
         | CAST(COUNT(*) * 1000000 // n_rejected AS BIGINT) AS sole_share_micro
         |FROM (SELECT CASE WHEN f_short THEN 'too_short'
         |        WHEN f_special THEN 'special_chars'
         |        WHEN f_stop THEN 'low_stopword'
         |        ELSE 'word_length' END AS reason, ntok
         |      FROM fl WHERE n_fail = 1) CROSS JOIN tot
         |GROUP BY reason, n_rejected""".stripMargin,

    "geo_neighbor_join" -> {
      s"""WITH cc AS (SELECT c_custkey, ${latSql("c_custkey")} AS c_lat,
         |  ${lonSql("c_custkey")} AS c_lon FROM customer),
         |cg AS (SELECT c_custkey, c_lat, c_lon, ${geohashCols("c_lat", "c_lon")} FROM cc),
         |ss AS (SELECT s_suppkey, ${latSql("s_suppkey")} AS s_lat,
         |  ${lonSql("s_suppkey")} AS s_lon FROM supplier),
         |sg AS (SELECT s_suppkey, s_lat, s_lon, ${geohashCols("s_lat", "s_lon")} FROM ss)
         |SELECT c_custkey, s_suppkey, dist2 FROM (
         | SELECT c_custkey, s_suppkey,
         |  ROUND((c_lat - s_lat) * (c_lat - s_lat)
         |    + (c_lon - s_lon) * (c_lon - s_lon) * 0.5749, 10) AS dist2,
         |  (c_lat - s_lat) * (c_lat - s_lat)
         |    + (c_lon - s_lon) * (c_lon - s_lon) * 0.5749 AS dist2_raw
         | FROM cg JOIN sg ON substr(cg.g_gh, 1, 5) = substr(sg.g_gh, 1, 5))
         |WHERE dist2_raw <= 0.0001""".stripMargin
    },

    "heavy_hitter_types" ->
      """SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type""",

    // GeoOps.geoPrefixCounts: geo-fenced per-nation rollup; the Spark
    // side's prefix filter is rewritten by the GeohashPrefixPushdown
    // rule (bbox conjuncts added), which this oracle confirms changes
    // nothing about the result set.
    "geo_prefix_counts" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey, ${latSql("c_custkey")} AS lat,
         | ${lonSql("c_custkey")} AS lon FROM customer),
         |g AS (SELECT c_custkey, c_nationkey, ${geohashCols("lat", "lon")} FROM c)
         |SELECT n_name, COUNT(*) AS n_customers
         |FROM g JOIN nation ON c_nationkey = n_nationkey
         |WHERE g_gh LIKE 'dr5%'
         |GROUP BY n_name""".stripMargin,

    "bigram_topk" ->
      s"""WITH t AS (SELECT CASE WHEN length(${norm("text")}) = 0 THEN []
         |  ELSE string_split(${norm("text")}, ' ') END AS toks FROM documents),
         |bg AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram
         | FROM t, unnest(CASE WHEN len(toks) >= 2
         |   THEN generate_series(1, len(toks) - 1) ELSE [] END) AS u(i))
         |SELECT bigram, COUNT(*) AS n FROM bg
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "multimodal_framesample" ->
      """WITH meta AS (
        | SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(1 + octet_length(encode(text)) % 30 AS INT) AS frames
        | FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, CAST(u.f AS INT) AS frame_idx,
        | u.f * (byte_len // greatest(frames, 1)) AS byte_offset
        |FROM meta, unnest(generate_series(0, frames - 1, 5)) AS u(f)""".stripMargin,

    "contamination_check" ->
      s"""WITH t AS (SELECT doc_id, CASE WHEN length(${norm("text")}) = 0 THEN []
         |  ELSE string_split(${norm("text")}, ' ') END AS toks FROM documents),
         |bg AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
         | FROM t, unnest(CASE WHEN len(toks) >= 2
         |   THEN generate_series(1, len(toks) - 1) ELSE [] END) AS u(i)),
         |probe AS (SELECT doc_id AS probe_id, bigram FROM bg WHERE doc_id < 5),
         |corpus AS (SELECT doc_id, bigram FROM bg WHERE doc_id >= 5)
         |SELECT corpus.doc_id, probe_id, COUNT(*) AS n_shared_bigrams
         |FROM corpus JOIN probe ON corpus.bigram = probe.bigram
         |GROUP BY corpus.doc_id, probe_id
         |HAVING COUNT(*) >= 3""".stripMargin,

    // TextOps.decontaminatedCorpus: the corpus minus probe docs and
    // every doc the contamination check flags.
    "decontaminated_corpus" ->
      s"""WITH t AS (SELECT doc_id, CASE WHEN length(${norm("text")}) = 0 THEN []
         |  ELSE string_split(${norm("text")}, ' ') END AS toks FROM documents),
         |bg AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
         | FROM t, unnest(CASE WHEN len(toks) >= 2
         |   THEN generate_series(1, len(toks) - 1) ELSE [] END) AS u(i)),
         |probe AS (SELECT doc_id AS probe_id, bigram FROM bg WHERE doc_id < 5),
         |corpus AS (SELECT doc_id, bigram FROM bg WHERE doc_id >= 5),
         |flagged AS (SELECT corpus.doc_id
         | FROM corpus JOIN probe ON corpus.bigram = probe.bigram
         | GROUP BY corpus.doc_id, probe_id HAVING COUNT(*) >= 3)
         |SELECT doc_id, lang, source, n_chars FROM documents d
         |WHERE doc_id >= 5
         |  AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = d.doc_id)""".stripMargin,

    // TextOps.gateReasonBreakdown: per-(source, gate outcome) doc/token
    // accounting with exact in-source micro shares.
    "gate_reason_breakdown" ->
      s"""WITH q AS ($qualityScoreSql),
         |r AS (SELECT doc_id, COALESCE(($gateReasonSql), 'pass') AS reason,
         |  COALESCE(n_tokens, 0) AS n_toks FROM q),
         |j AS (SELECT r.reason, r.n_toks, d.source
         | FROM r JOIN documents d USING (doc_id)),
         |g AS (SELECT source, reason, COUNT(*) AS n_docs,
         |  SUM(n_toks) AS n_tokens FROM j GROUP BY 1, 2)
         |SELECT source, reason, CAST(n_docs AS BIGINT) AS n_docs,
         | CAST(n_tokens AS BIGINT) AS n_tokens,
         | CAST((n_docs * 1000000) //
         |   SUM(n_docs) OVER (PARTITION BY source) AS BIGINT) AS share_micro
         |FROM g""".stripMargin,

    // AuditOps.kAnonymityReport: quasi-identifier equivalence-class
    // size histogram (log2 classes via exact length(bin(g))-1).
    "k_anonymity_report" ->
      """WITH grp AS (SELECT lang, source, n_chars // 256 AS cb,
        |  COUNT(*) AS g FROM documents GROUP BY 1, 2, 3),
        |cls AS (SELECT g, CAST(length(bin(g)) - 1 AS BIGINT) AS size_class
        | FROM grp)
        |SELECT size_class, CAST(COUNT(*) AS BIGINT) AS n_groups,
        | CAST(SUM(g) AS BIGINT) AS n_docs,
        | CAST(SUM(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT) AS n_risk_docs
        |FROM cls GROUP BY size_class""".stripMargin,

    // AuditOps.lDiversityReport: sensitive-attribute diversity histogram
    // per quasi-identifier class (homogeneity-attack gate).
    "l_diversity_report" ->
      """WITH grp AS (SELECT source, n_chars // 256 AS cb,
        |  COUNT(*) AS g, COUNT(DISTINCT lang) AS ld
        | FROM documents GROUP BY 1, 2)
        |SELECT CAST(ld AS BIGINT) AS l_distinct,
        | CAST(COUNT(*) AS BIGINT) AS n_groups,
        | CAST(SUM(g) AS BIGINT) AS n_docs,
        | ld < 3 AS is_risk
        |FROM grp GROUP BY ld""".stripMargin,

    // SimilarityOps.ivfCellBalance: per-cell occupancy of the fixed IVF
    // index — exact micro shares against the 1-row total.
    "ivf_cell_balance" ->
      s"""WITH celled AS ($ivfCelledSelect),
         |counts AS (SELECT cell, COUNT(*) AS n_vecs FROM celled GROUP BY cell),
         |tot AS (SELECT SUM(n_vecs) AS n_total FROM counts)
         |SELECT CAST(cell AS BIGINT) AS cell, CAST(n_vecs AS BIGINT) AS n_vecs,
         | CAST((n_vecs * 1000000) // n_total AS BIGINT) AS share_micro,
         | CAST((n_vecs * 16 * 1000000) // n_total AS BIGINT) AS load_factor_micro,
         | n_vecs * 16 >= 2 * n_total AS hot
         |FROM counts, tot""".stripMargin,

    // SimilarityOps.embedCentroidDrift: per-label centroid vs global
    // centroid, exact integer squared distance between sign-branched
    // truncated-micro means.
    "embed_centroid_drift" ->
      """WITH e AS (
        | SELECT label, d.dim AS dim,
        |  CAST(TRUNC(embedding[d.dim]::DOUBLE * 1000000) AS BIGINT) AS micro
        | FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS dim) d
        | WHERE embedding IS NOT NULL AND NOT isnan(embedding[d.dim]::DOUBLE)),
        |lab AS (SELECT label, dim,
        |  CASE WHEN SUM(CAST(micro AS HUGEINT)) >= 0
        |   THEN CAST(SUM(CAST(micro AS HUGEINT)) // COUNT(*) AS BIGINT)
        |   ELSE -CAST((-SUM(CAST(micro AS HUGEINT))) // COUNT(*) AS BIGINT)
        |  END AS ml
        | FROM e GROUP BY label, dim),
        |gmean AS (SELECT dim,
        |  CASE WHEN SUM(CAST(micro AS HUGEINT)) >= 0
        |   THEN CAST(SUM(CAST(micro AS HUGEINT)) // COUNT(*) AS BIGINT)
        |   ELSE -CAST((-SUM(CAST(micro AS HUGEINT))) // COUNT(*) AS BIGINT)
        |  END AS mg
        | FROM e GROUP BY dim),
        |nv AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
        | FROM embeddings WHERE embedding IS NOT NULL GROUP BY label)
        |SELECT l.label, nv.n_vecs,
        | CAST(SUM((ml - mg) * (ml - mg)) AS BIGINT) AS drift_micro2
        |FROM lab l JOIN gmean g USING (dim) JOIN nv ON nv.label = l.label
        |GROUP BY l.label, nv.n_vecs""".stripMargin,

    // ClassifierOps.qualityCalibration: fixed-weight score deciles via
    // the distinct-quantized-logit CDF, observed keep rate per decile.
    "quality_calibration" -> {
      val wq = graft.operators.ClassifierOps.FixedWeightsMicro
      val off = graft.operators.ClassifierOps.BucketOffset
      val div = graft.operators.ClassifierOps.BucketDiv
      s"""WITH q AS ($qualityScoreSql),
         |f AS (SELECT
         |  CAST(LEAST(COALESCE(n_tokens, 0), 500) * 20 AS BIGINT) AS f_len,
         |  CAST(COALESCE(ROUND(special_ratio * 10000), 0) AS BIGINT) AS f_special,
         |  CAST(COALESCE(ROUND(stop_ratio * 10000), 0) AS BIGINT) AS f_stop,
         |  LEAST(COALESCE(CAST(ROUND(avg_word_len * 10000) AS BIGINT), 0),
         |    200000) // 20 AS f_awl,
         |  ($gateReasonSql) IS NULL AS y
         | FROM q),
         |s AS (SELECT (${wq(0)}::BIGINT * 10000 + ${wq(1)}::BIGINT * f_len
         |  + ${wq(2)}::BIGINT * f_special + ${wq(3)}::BIGINT * f_stop
         |  + ${wq(4)}::BIGINT * f_awl + $off) // $div AS s, y FROM f),
         |g AS (SELECT s, COUNT(*) AS n,
         |  SUM(CASE WHEN y THEN 1 ELSE 0 END) AS npos FROM s GROUP BY s),
         |c AS (SELECT s, n, npos, SUM(n) OVER (ORDER BY s
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g),
         |t AS (SELECT SUM(n) AS total FROM g),
         |d AS (SELECT ((cum - 1) * 10) // total + 1 AS decile, n, npos, s
         | FROM c, t)
         |SELECT CAST(decile AS BIGINT) AS decile,
         | CAST(SUM(n) AS BIGINT) AS n_docs,
         | CAST(SUM(npos) AS BIGINT) AS n_keep,
         | CAST((SUM(npos) * 1000000) // SUM(n) AS BIGINT) AS keep_rate_micro,
         | CAST(MIN(s) AS BIGINT) AS bucket_lo,
         | CAST(MAX(s) AS BIGINT) AS bucket_hi
         |FROM d GROUP BY decile""".stripMargin
    },

    "rarity_score" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(${norm("text")}, ' ')) AS tok
         | FROM documents WHERE length(${norm("text")}) > 0),
         |tf AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
         |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM tf)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         | ROUND(CAST(CAST(SUM(total // tf) AS BIGINT) AS DOUBLE) / COUNT(*), 4)
         |   AS avg_rarity
         |FROM toks JOIN tf USING (tok) CROSS JOIN tot
         |GROUP BY doc_id""".stripMargin,

    "ngram_lm_score" ->
      s"""WITH t AS (SELECT doc_id, CASE WHEN length(${norm("text")}) = 0 THEN []
         |  ELSE string_split(${norm("text")}, ' ') END AS toks FROM documents),
         |uni AS (
         | SELECT u.tok AS first_tok, COUNT(*) AS cw
         | FROM t, unnest(toks) AS u(tok) GROUP BY u.tok),
         |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram,
         |  toks[i] AS first_tok
         | FROM t, unnest(CASE WHEN len(toks) >= 2
         |   THEN generate_series(1, len(toks) - 1) ELSE [] END) AS u(i)),
         |bgc AS (SELECT bigram, COUNT(*) AS cab FROM bg GROUP BY bigram)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         | ROUND(CAST(CAST(SUM((cab * 1000000) // cw) AS BIGINT) AS DOUBLE)
         |  / COUNT(*), 4) AS lm_score
         |FROM bg JOIN bgc USING (bigram) JOIN uni USING (first_tok)
         |GROUP BY doc_id""".stripMargin,

    "doc_keyterms" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(${norm("text")}, ' ')) AS tok
         | FROM documents WHERE length(${norm("text")}) > 0),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
         |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |nd AS (SELECT COUNT(*) AS n_docs FROM documents
         |       WHERE length(${norm("text")}) > 0),
         |s AS (SELECT doc_id, tok, tf, df,
         |  CAST(tf * ((n_docs * 1000) // df) AS BIGINT) AS score
         | FROM tf JOIN df USING (tok) CROSS JOIN nd),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |  ORDER BY score DESC, tok) AS BIGINT) AS rank FROM s)
         |SELECT doc_id, tok, tf, df, score, rank FROM r WHERE rank <= 3""".stripMargin,

    "template_fingerprint" ->
      s"""SELECT template_fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         | MIN(doc_id) AS rep_doc_id
         |FROM (SELECT doc_id, source,
         |  ${hash60Sql("regexp_replace(array_to_string(" +
        s"(string_split(${norm("text")}, ' '))[1:8], ' '), '[0-9]+', '#', 'g')")}
         |    AS template_fp
         | FROM documents)
         |GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin,

    "tfidf_doc_pairs" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(${norm("text")}, ' ')) AS tok
         | FROM documents WHERE length(${norm("text")}) > 0),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
         |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
         |w AS (SELECT doc_id, tok, df,
         |  CAST(tf * ((n_docs * 1000) // df) AS BIGINT) AS wt
         | FROM tf JOIN df USING (tok) CROSS JOIN nd),
         |norms AS (SELECT doc_id,
         |  CAST(SUM(CAST(wt AS HUGEINT) * wt) AS HUGEINT) AS norm2
         | FROM w GROUP BY doc_id),
         |idx AS (SELECT tok, doc_id, wt FROM w WHERE df <= 100),
         |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(SUM(CAST(a.wt AS HUGEINT) * b.wt) AS HUGEINT) AS dot,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         | FROM idx a JOIN idx b ON a.tok = b.tok AND a.doc_id < b.doc_id
         | GROUP BY 1, 2),
         |j AS (SELECT doc_a, doc_b, n_shared,
         |  CAST(dot AS DOUBLE) /
         |    sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)) AS sim
         | FROM dots JOIN norms na ON na.doc_id = doc_a
         |  JOIN norms nb ON nb.doc_id = doc_b)
         |SELECT doc_a, doc_b, n_shared, ROUND(sim, 4) AS sim
         |FROM j WHERE sim >= 0.25""".stripMargin,

    "repetition_report" ->
      s"""WITH t AS (SELECT doc_id, CASE WHEN length(${norm("text")}) = 0 THEN []
         |  ELSE string_split(${norm("text")}, ' ') END AS toks FROM documents),
         |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
         | FROM t, unnest(CASE WHEN len(toks) >= 2
         |   THEN generate_series(1, len(toks) - 1) ELSE [] END) AS u(i)),
         |pc AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY doc_id, bigram)
         |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         | COUNT(*) AS n_distinct_bigrams,
         | ROUND(CAST(CAST(SUM(n) AS BIGINT) - COUNT(*) AS DOUBLE)
         |   / CAST(SUM(n) AS BIGINT), 4) AS dup_bigram_frac,
         | ROUND(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS BIGINT), 4)
         |   AS top_bigram_frac,
         | ROUND(CAST(CAST(SUM(n) AS BIGINT) - COUNT(*) AS DOUBLE)
         |   / CAST(SUM(n) AS BIGINT), 4) >= 0.2 AS is_repetitive
         |FROM pc GROUP BY doc_id""".stripMargin,

    "multimodal_resize" ->
      """WITH meta AS (
        | SELECT doc_id, 'image' AS media_type,
        |  CAST(64 + octet_length(encode(text)) % 64 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 7) % 64 AS INT) AS height
        | FROM documents WHERE doc_id % 3 = 0),
        |sc AS (SELECT *, 100 * 96 // greatest(width, height) AS scale_pct FROM meta)
        |SELECT doc_id, media_type, width, height,
        | CAST(width * scale_pct // 100 AS INT) AS target_w,
        | CAST(height * scale_pct // 100 AS INT) AS target_h,
        | CAST(scale_pct AS BIGINT) AS scale_pct
        |FROM sc""".stripMargin,

    "events_asof_signup" ->
      """WITH base AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type, value FROM events),
        |u AS (
        | SELECT user_id, ts_s, 0 AS side, event_id, value FROM base
        |  WHERE event_type = 'signup'
        | UNION ALL
        | SELECT user_id, ts_s, 1 AS side, event_id, value FROM base
        |  WHERE event_type = 'purchase'),
        |w AS (SELECT *, last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |        ROWS UNBOUNDED PRECEDING) AS last_signup_value
        | FROM u)
        |SELECT event_id, user_id, ts_s, value, last_signup_value
        |FROM w WHERE side = 1""".stripMargin,

    // row-level as-of semantics (the physical operator carries the whole
    // matched signup ROW): resolve the matched signup's event_id via the
    // union-window, then join back by the globally-unique event_id to
    // fetch its ts and value — value rides along even if NULL
    "events_asof_physical" ->
      """WITH base AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type, value FROM events),
        |u AS (
        | SELECT user_id, ts_s, 0 AS side, event_id, value FROM base
        |  WHERE event_type = 'signup'
        | UNION ALL
        | SELECT user_id, ts_s, 1 AS side, event_id, value FROM base
        |  WHERE event_type = 'purchase'),
        |w AS (SELECT *, last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sig_event
        | FROM u)
        |SELECT w.event_id, w.user_id, w.ts_s, w.value,
        | s.event_id AS signup_event, s.ts_s AS signup_ts,
        | s.value AS signup_value
        |FROM w LEFT JOIN base s ON s.event_id = w.sig_event
        |WHERE w.side = 1""".stripMargin,

    "events_asof_recent" ->
      """WITH base AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type, value FROM events),
        |u AS (
        | SELECT user_id, ts_s, 0 AS side, event_id, value FROM base
        |  WHERE event_type = 'signup'
        | UNION ALL
        | SELECT user_id, ts_s, 1 AS side, event_id, value FROM base
        |  WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |  last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |         ROWS UNBOUNDED PRECEDING) AS lsv,
        |  last_value(CASE WHEN side = 0 THEN ts_s END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |         ROWS UNBOUNDED PRECEDING) AS lst
        | FROM u)
        |SELECT event_id, user_id, ts_s, value,
        | CASE WHEN lst IS NOT NULL AND ts_s - lst <= 3600 THEN lsv END
        |   AS recent_signup_value,
        | CASE WHEN lst IS NOT NULL AND ts_s - lst <= 3600 THEN ts_s - lst END
        |   AS signup_age_s
        |FROM w WHERE side = 1""".stripMargin,

    "purchase_attribution" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
        | WHERE user_id IS NOT NULL),
        |u AS (
        | SELECT user_id, ts_s, 0 AS side, event_id, event_type FROM base
        |  WHERE event_type IN ('click', 'view')
        | UNION ALL
        | SELECT user_id, ts_s, 1 AS side, event_id, event_type FROM base
        |  WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |  last_value(CASE WHEN side = 0 THEN event_type END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |         ROWS UNBOUNDED PRECEDING) AS ltt,
        |  last_value(CASE WHEN side = 0 THEN ts_s END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |         ROWS UNBOUNDED PRECEDING) AS ltts
        | FROM u),
        |att AS (
        | SELECT event_id,
        |  CASE WHEN ltts IS NOT NULL AND ts_s - ltts <= 259200 THEN ltt
        |       ELSE 'organic' END AS touch_type
        | FROM w WHERE side = 1),
        |g AS (
        | SELECT touch_type, COUNT(*) AS n_purchases,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
        | FROM att JOIN base USING (event_id) GROUP BY 1)
        |SELECT touch_type, n_purchases, revenue,
        | CAST((n_purchases * 1000000) // (SUM(n_purchases) OVER ()) AS BIGINT)
        |   AS purchase_share_micro
        |FROM g""".stripMargin,

    "event_funnel" ->
      """WITH per_user AS (
        | SELECT user_id,
        |  MIN(CASE WHEN event_type = 'signup'
        |      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS first_signup,
        |  MAX(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS last_purchase
        | FROM events GROUP BY user_id)
        |SELECT CASE WHEN first_signup IS NULL THEN 0
        |  WHEN last_purchase IS NOT NULL AND last_purchase >= first_signup THEN 2
        |  ELSE 1 END AS funnel_stage, COUNT(*) AS n_users
        |FROM per_user GROUP BY 1""".stripMargin,

    // exact-cents Hamilton split per purchase; RANGE-frame counts
    // replace the purchases×touches interval join
    "linear_attribution" ->
      """WITH e AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |c AS (
        | SELECT user_id, ts_s, event_type, cents,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS nv,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS nc
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |   RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW)),
        |p AS (
        | SELECT cents, nv, nc, nv + nc AS n,
        |  CASE WHEN nv + nc = 0 THEN 0 ELSE (cents * nv) // (nv + nc) END AS cv0,
        |  CASE WHEN nv + nc = 0 THEN 0 ELSE (cents * nc) // (nv + nc) END AS cc0,
        |  CASE WHEN nv + nc = 0 THEN 0 ELSE (cents * nv) % (nv + nc) END AS rv,
        |  CASE WHEN nv + nc = 0 THEN 0 ELSE (cents * nc) % (nv + nc) END AS rc
        | FROM c WHERE event_type = 'purchase'),
        |cr AS (
        | SELECT *, cents - cv0 - cc0 AS leftover,
        |  cv0 + CASE WHEN n > 0 AND rv >= rc
        |    THEN cents - cv0 - cc0 ELSE 0 END AS cv,
        |  cc0 + CASE WHEN n > 0 AND rv < rc
        |    THEN cents - cv0 - cc0 ELSE 0 END AS cc
        | FROM p),
        |x AS (
        | SELECT 'view' AS touch_type, cv AS credit_cents FROM cr
        | UNION ALL SELECT 'click', cc FROM cr
        | UNION ALL SELECT 'organic',
        |  CASE WHEN n = 0 THEN cents ELSE 0 END FROM cr)
        |SELECT touch_type,
        | CAST(COUNT(CASE WHEN credit_cents > 0 THEN 1 END) AS BIGINT)
        |   AS n_credited_purchases,
        | ROUND(SUM(credit_cents) / 100.0, 2) AS credit
        |FROM x GROUP BY 1""".stripMargin,

    // running-maxima reformulation of the ordered-chain existence test;
    // RANGE frames so equal timestamps resolve set-wise in both engines
    // the stream-emission mirror: same lv/clv RANGE staging as
    // window_funnel, then a per-event achieved level and a running best
    // over (ts, view<click<purchase) ROWS order; a row survives where
    // best strictly increases. Tie groups compute identical running
    // values, so both engines emit the same rows whatever the physical
    // peer order.
    "funnel_progress" ->
      """WITH e AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type,
        |  CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |   ELSE 2 END AS rk
        | FROM events
        | WHERE event_type IN ('view', 'click', 'purchase')
        |  AND ts IS NOT NULL),
        |s1 AS (
        | SELECT user_id, ts_s, event_type, rk,
        |  MAX(CASE WHEN event_type = 'view' THEN ts_s END) OVER w AS lv
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s2 AS (
        | SELECT user_id, ts_s, event_type, rk, lv,
        |  MAX(CASE WHEN event_type = 'click' THEN lv END) OVER w AS clv
        | FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (
        | SELECT user_id, ts_s, rk,
        |  CASE WHEN event_type = 'view' THEN 1
        |       WHEN event_type = 'click' AND lv >= ts_s - 21600 THEN 2
        |       WHEN event_type = 'purchase' AND clv >= ts_s - 21600 THEN 3
        |       ELSE 0 END AS ach
        | FROM s2),
        |b AS (
        | SELECT user_id, ts_s,
        |  MAX(ach) OVER (PARTITION BY user_id ORDER BY ts_s, rk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best,
        |  COALESCE(MAX(ach) OVER (PARTITION BY user_id ORDER BY ts_s, rk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_best
        | FROM a)
        |SELECT user_id, ts_s, CAST(best AS BIGINT) AS funnel_level
        |FROM b WHERE best > prev_best""".stripMargin,

    "window_funnel" ->
      """WITH e AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type
        | FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (
        | SELECT user_id, ts_s, event_type,
        |  MAX(CASE WHEN event_type = 'view' THEN ts_s END) OVER w AS lv
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s2 AS (
        | SELECT user_id, ts_s, event_type, lv,
        |  MAX(CASE WHEN event_type = 'click' THEN lv END) OVER w AS clv
        | FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pu AS (
        | SELECT user_id,
        |  MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
        |  MAX(CASE WHEN event_type = 'click' AND lv >= ts_s - 21600
        |      THEN 1 ELSE 0 END) AS l2,
        |  MAX(CASE WHEN event_type = 'purchase' AND clv >= ts_s - 21600
        |      THEN 1 ELSE 0 END) AS l3
        | FROM s2 GROUP BY user_id)
        |SELECT CAST(CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
        |  WHEN l1 = 1 THEN 1 ELSE 0 END AS BIGINT) AS funnel_level,
        | CAST(COUNT(*) AS BIGINT) AS n_users,
        | CAST((COUNT(*) * 1000000) // SUM(COUNT(*)) OVER () AS BIGINT)
        |   AS user_share_micro
        |FROM pu GROUP BY 1""".stripMargin,

    "events_dedup_window" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |w AS (
        | SELECT *, LAG(ts_s) OVER (PARTITION BY user_id, event_type
        |   ORDER BY ts_s, event_id) AS prev_ts
        | FROM e)
        |SELECT event_id, user_id, event_type, ts_s FROM w
        |WHERE prev_ts IS NULL OR ts_s - prev_ts > 300""".stripMargin,

    "event_transitions" ->
      """WITH e AS (
        | SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |w AS (
        | SELECT event_type AS from_type,
        |  LEAD(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts_s, event_id) AS to_type
        | FROM e)
        |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
        |FROM w WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type""".stripMargin,

    "perplexity_buckets" ->
      s"""WITH t AS (SELECT doc_id, CASE WHEN length(${norm("text")}) = 0 THEN []
         |  ELSE string_split(${norm("text")}, ' ') END AS toks FROM documents),
         |uni AS (
         | SELECT u.tok AS first_tok, COUNT(*) AS cw
         | FROM t, unnest(toks) AS u(tok) GROUP BY u.tok),
         |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram,
         |  toks[i] AS first_tok
         | FROM t, unnest(CASE WHEN len(toks) >= 2
         |   THEN generate_series(1, len(toks) - 1) ELSE [] END) AS u(i)),
         |bgc AS (SELECT bigram, COUNT(*) AS cab FROM bg GROUP BY bigram),
         |doc AS (
         | SELECT doc_id,
         |  CAST(SUM((cab * 1000000) // cw) AS BIGINT) // COUNT(*) AS score_micro
         | FROM bg JOIN bgc USING (bigram) JOIN uni USING (first_tok)
         | GROUP BY doc_id),
         |by_score AS (
         | SELECT score_micro, CAST(COUNT(*) AS BIGINT) AS n
         | FROM doc GROUP BY score_micro),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM doc),
         |cum AS (
         | SELECT score_micro, n,
         |  CAST(SUM(n) OVER (ORDER BY score_micro
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
         |  nd
         | FROM by_score CROSS JOIN nd)
         |SELECT CAST(((cum_n - n) * 4) // nd + 1 AS BIGINT) AS bucket,
         | CAST(SUM(n) AS BIGINT) AS n_docs,
         | CAST(MIN(score_micro) AS BIGINT) AS min_score_micro,
         | CAST(MAX(score_micro) AS BIGINT) AS max_score_micro
         |FROM cum GROUP BY 1""".stripMargin,

    "corpus_stats" ->
      s"""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN length(${norm("text")}) = 0 THEN 0
         |   ELSE len(string_split(${norm("text")}, ' ')) END) AS BIGINT) AS n_tokens,
         | CAST(SUM(length(text)) AS BIGINT) AS n_chars,
         | CAST((CAST(SUM(length(text)) AS HUGEINT) * 1000000) // COUNT(*)
         |   AS BIGINT) AS chars_per_doc_micro
         |FROM documents GROUP BY lang, source""".stripMargin
  )

  private val eStreaming: Map[String, String] = Map(
    "events_interval_join" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts,
        |  value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, event_id AS signup_id, ts AS s_ts FROM events
        |  WHERE event_type = 'signup')
        |SELECT p.user_id, purchase_id, signup_id, purchase_value,
        | CAST(floor(epoch(p_ts)) AS BIGINT) - CAST(floor(epoch(s_ts)) AS BIGINT)
        |   AS lag_seconds
        |FROM p JOIN s ON p.user_id = s.user_id
        | AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR""".stripMargin,

    "composed_revenue_report" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
        | ROUND(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2))
        |   - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE), 4)
        |   AS total_revenue,
        | CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INT)
        |   AS min_days,
        | CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INT)
        |   AS max_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "segment_event_totals" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE user_id IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "key_skew_report" -> {
      val legs = Seq(
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("events.user_id", "events", "user_id"),
        ("events.event_type", "events", "event_type"))
      val ctes = legs.zipWithIndex.map { case ((_, tbl, k), i) =>
        s"""c$i AS (SELECT COALESCE(CAST($k AS VARCHAR), '<null>') AS k,
           |  COUNT(*) AS cnt FROM $tbl GROUP BY 1),
           |a$i AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
           |  COUNT(*) AS n_keys, MAX(cnt) AS max_cnt FROM c$i),
           |t$i AS (SELECT MIN(k) AS top_key FROM c$i, a$i
           |  WHERE cnt = max_cnt)""".stripMargin
      }.mkString(",\n")
      val sels = legs.zipWithIndex.map { case ((name, _, _), i) =>
        s"""SELECT '$name' AS key_name, n_rows, n_keys, max_cnt, top_key,
           | CAST((CAST(max_cnt AS HUGEINT) * 1000000) // n_rows AS BIGINT)
           |   AS max_share_micro,
           | CAST((CAST(max_cnt AS HUGEINT) * n_keys * 1000000) // n_rows
           |   AS BIGINT) AS skew_factor_micro
           |FROM a$i, t$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $ctes\n$sels"
    },

    "events_window_uniques" ->
      """SELECT date_trunc('hour', ts) AS hour_start,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE ts IS NOT NULL GROUP BY 1""".stripMargin,

    "events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        | COUNT(*) AS n_events,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // hopping 1h window / 15min slide: an event in 15-min bucket b covers
    // exactly the 4 windows starting at (b-3..b)*900s (epoch-aligned, the
    // same grid Spark's window() uses)
    "events_hopping" ->
      """WITH e AS (SELECT event_type, value,
        |  CAST(floor(epoch(ts) / 900) AS BIGINT) AS b FROM events)
        |SELECT make_timestamp((b - u.k) * 900 * 1000000) AS window_start,
        | event_type, COUNT(*) AS n_events,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM e, unnest([0, 1, 2, 3]) AS u(k)
        |GROUP BY 1, 2""".stripMargin,

    "events_session_window" ->
      """WITH lagged AS (SELECT user_id, event_id, ts, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |flagged AS (SELECT *, CASE WHEN prev_ts IS NULL
        |  OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
        | FROM lagged),
        |sess AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        | MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        | COUNT(*) AS n_events,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "scd2_customer_versions" ->
      """WITH versions AS (
        | SELECT c_custkey, CAST(year(o_orderdate) AS INT) AS version_year,
        |  c_mktsegment, MIN(CAST(o_orderdate AS DATE)) AS valid_from,
        |  COUNT(*) AS n_orders
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_custkey, CAST(year(o_orderdate) AS INT), c_mktsegment)
        |SELECT *, valid_to IS NULL AS is_current FROM (
        | SELECT c_custkey, version_year, c_mktsegment, valid_from, n_orders,
        |  lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY version_year)
        |    AS valid_to
        | FROM versions)""".stripMargin,

    "price_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS bucket,
        | COUNT(*) AS n_orders,
        | ROUND(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS min_price,
        | ROUND(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS max_price
        |FROM orders GROUP BY 1""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, ts FROM events),
        |lagged AS (SELECT *, lag(ts_s) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s FROM e),
        |flagged AS (SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800
        |  THEN 1 ELSE 0 END AS new_session FROM lagged),
        |sess AS (SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        | FROM flagged),
        |per_sess AS (SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MAX(ts_s) - MIN(ts_s) AS duration_s FROM sess GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        | CAST(SUM(n_events) AS BIGINT) AS n_events,
        | MAX(duration_s) AS max_session_s,
        | ROUND(CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
        |   AS avg_events_per_session
        |FROM per_sess GROUP BY user_id""".stripMargin,

    "session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, ts FROM events),
        |lagged AS (SELECT *, lag(ts_s) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s FROM e),
        |flagged AS (SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800
        |  THEN 1 ELSE 0 END AS new_session FROM lagged),
        |sess AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM flagged),
        |firstk AS (SELECT *, row_number() OVER (
        |  PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rnk
        | FROM sess),
        |paths AS (SELECT user_id, session_id,
        |  string_agg(event_type, '>' ORDER BY rnk) AS path
        | FROM firstk WHERE rnk <= 5 GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin
  )

  /** Round-9 additions: drift statistics, profiling audits, incremental
    * view maintenance, entity resolution.
    */
  private val fRound9: Map[String, String] = Map(
    // TrendOps.orderArrivalDispersion: Fano dispersion of daily order
    // counts, cross-multiplied exact integers, one HUGEINT division.
    "order_arrival_dispersion" ->
      """WITH d AS (SELECT o_orderdate AS day, COUNT(*) AS c
        | FROM orders GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(c) AS BIGINT) AS s,
        |  SUM(CAST(c AS HUGEINT) * c) AS q FROM d)
        |SELECT n AS n_days, s AS n_orders,
        | CAST((1000 * CAST(s AS HUGEINT)) // n AS BIGINT) AS mean_milli,
        | CAST(((CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) * 1000000)
        |   // (CAST(s AS HUGEINT) * (n - 1)) AS BIGINT) AS fano_micro
        |FROM g WHERE n >= 2 AND s >= 1""".stripMargin,

    // AsOfOps.conversionLatencyQuartiles: as-of latency per conversion,
    // exact percentile_disc quartiles on the distinct-latency CDF.
    "conversion_latency_quartiles" ->
      """WITH base AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type FROM events),
        |u AS (
        | SELECT user_id, ts_s, 0 AS side, event_id FROM base
        |  WHERE event_type = 'signup'
        | UNION ALL
        | SELECT user_id, ts_s, 1 AS side, event_id FROM base
        |  WHERE event_type = 'purchase'),
        |w AS (SELECT *, last_value(CASE WHEN side = 0 THEN ts_s END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sig_ts
        | FROM u),
        |lat AS (SELECT ts_s - sig_ts AS lat_s FROM w
        | WHERE side = 1 AND sig_ts IS NOT NULL),
        |byv AS (SELECT lat_s, COUNT(*) AS m FROM lat GROUP BY 1),
        |c AS (SELECT lat_s, CAST(SUM(m) OVER (ORDER BY lat_s
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM byv),
        |t AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM byv)
        |SELECT n AS n_conversions,
        | MIN(CASE WHEN cum * 4 >= n THEN lat_s END) AS p25_s,
        | MIN(CASE WHEN cum * 4 >= 2 * n THEN lat_s END) AS p50_s,
        | MIN(CASE WHEN cum * 4 >= 3 * n THEN lat_s END) AS p75_s,
        | MAX(lat_s) AS max_s
        |FROM c, t GROUP BY n""".stripMargin,

    // StatOps.ksOrderDrift: sup over the dollar-quantized CDFs via
    // cross-multiplied integer counts; d_micro is integer division of
    // positive exact integers (both engines truncate).
    "ks_order_drift" ->
      """WITH byd AS (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS usd,
        |  CAST(SUM(CASE WHEN o_orderdate < '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |  CAST(SUM(CASE WHEN o_orderdate < '1998-01-01' THEN 0 ELSE 1 END) AS BIGINT) AS b
        | FROM orders GROUP BY 1),
        |cum AS (SELECT usd,
        |  CAST(SUM(a) OVER (ORDER BY usd ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
        |  CAST(SUM(b) OVER (ORDER BY usd ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
        | FROM byd),
        |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n_early,
        |  CAST(SUM(b) AS BIGINT) AS n_late FROM byd),
        |d AS (SELECT usd, n_early, n_late,
        |  CAST(abs(CAST(n_late AS DECIMAL(19,0)) * ca
        |    - CAST(n_early AS DECIMAL(19,0)) * cb) AS DECIMAL(38,0)) AS diff
        | FROM cum, tot),
        |mx AS (SELECT MAX(diff) AS dmax FROM d)
        |SELECT n_early, n_late, MIN(usd) AS ks_at_usd,
        | -- HUGEINT //: DECIMAL // rounds instead of flooring (see
        | -- priority_mix_shift). One-sided input -> D = 0 (no division).
        | CAST(CASE WHEN n_early = 0 OR n_late = 0 THEN 0
        |  ELSE CAST(dmax AS HUGEINT) * 1000000
        |   // (CAST(n_early AS HUGEINT) * n_late) END AS BIGINT) AS d_micro
        |FROM d, mx WHERE diff = dmax
        |GROUP BY n_early, n_late, dmax""".stripMargin,

    // CleanOps.jsonKeyProfile: key discovery via json_keys; values
    // string-unwrapped through the computed path (scalar payloads only,
    // matching Spark's map<string,string> parse).
    "json_key_profile" ->
      """WITH d AS (SELECT
        |  CASE WHEN event_id % 4 = 0 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR)
        |    || ', "device": "ios", "price": ' || CAST(event_id % 90 AS VARCHAR) || '.5}'
        |   WHEN event_id % 4 = 1 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR)
        |    || ', "device": "android"}'
        |   WHEN event_id % 4 = 2 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR)
        |    || ', "price": ' || CAST(event_id % 90 AS VARCHAR) || '.25}'
        |   ELSE '{"k": ' || CAST(event_id % 100 AS VARCHAR) || '}' END AS j
        | FROM events),
        |kv AS (SELECT key, json_extract_string(j, '$.' || key) AS v
        | FROM (SELECT j, unnest(json_keys(j)) AS key FROM d)),
        |tot AS (SELECT COUNT(*) AS n_events FROM d),
        |g AS (SELECT key, COUNT(*) AS n_present,
        |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_values,
        |  MIN(CASE WHEN regexp_full_match(v, '-?[0-9]+(\.[0-9]+)?')
        |    THEN 1 ELSE 0 END) AS all_numeric
        | FROM kv GROUP BY key)
        |SELECT key, n_present,
        | n_present * 1000000 // n_events AS present_share_micro,
        | n_values,
        | CASE WHEN all_numeric = 1 THEN 'number' ELSE 'string' END
        |   AS inferred_type
        |FROM g, tot""".stripMargin,

    // StatOps.priorityMixShift: observed vs floor(1000·rt·ct/n) expected
    // cell counts over the priority × date-half contingency grid.
    "priority_mix_shift" ->
      """WITH cells AS (SELECT o_orderpriority AS priority,
        |  CASE WHEN o_orderdate < '1998-01-01' THEN 'early' ELSE 'late' END AS half,
        |  COUNT(*) AS obs FROM orders GROUP BY 1, 2),
        |m AS (SELECT priority, half, obs,
        |  CAST(SUM(obs) OVER (PARTITION BY priority) AS BIGINT) AS rt,
        |  CAST(SUM(obs) OVER (PARTITION BY half) AS BIGINT) AS ct,
        |  CAST(SUM(obs) OVER () AS BIGINT) AS n FROM cells),
        |e AS (SELECT priority, half, obs,
        |  -- HUGEINT //: true integer division. DECIMAL // in DuckDB
        |  -- ROUNDS the decimal quotient (it is not a floor), which is
        |  -- off by one against Spark's integral div half the time.
        |  CAST((CAST(rt AS HUGEINT) * ct * 1000)
        |    // CAST(n AS HUGEINT) AS BIGINT) AS exp_milli FROM m)
        |SELECT priority, half, obs, exp_milli,
        | obs * 1000 - exp_milli AS dev_milli FROM e""".stripMargin,

    // TextOps.tokenRankOctaves: frequency-of-frequency rank spans split
    // across their floor-log2 octaves (length(bin(x))-1, exact integer).
    "token_rank_octaves" -> {
      val t = normTextSql("text")
      s"""WITH toks AS (SELECT unnest(string_split($t, ' ')) AS tok
         |  FROM documents WHERE length($t) > 0),
         |freq AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok),
         |fof AS (SELECT f, COUNT(*) AS m FROM freq GROUP BY f),
         |spans AS (SELECT f, m,
         |  CAST(SUM(m) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS rank_end FROM fof),
         |sp2 AS (SELECT f, rank_end, rank_end - m + 1 AS rank_start FROM spans),
         |oct AS (SELECT f, rank_start, rank_end,
         |  unnest(generate_series(length(bin(rank_start)) - 1,
         |    length(bin(rank_end)) - 1)) AS o FROM sp2),
         |r AS (SELECT f, o,
         |  GREATEST(rank_start, CAST(1 AS BIGINT) << o) AS lo,
         |  LEAST(rank_end, (CAST(1 AS BIGINT) << (o + 1)) - 1) AS hi FROM oct)
         |SELECT CAST(o AS BIGINT) AS rank_octave,
         | CAST(SUM(hi - lo + 1) AS BIGINT) AS n_tokens,
         | CAST(SUM((hi - lo + 1) * f) AS BIGINT) AS token_mass,
         | CAST(MAX(f) AS BIGINT) AS max_freq, CAST(MIN(f) AS BIGINT) AS min_freq
         |FROM r GROUP BY 1""".stripMargin
    },

    // TextOps.piiDetectReport: same dirty synthesis + shared patterns as
    // pii_redact, rolled up per (source, pii_type).
    "pii_detect_report" -> {
      import graft.operators.TextOps.{PiiEmail, PiiPhone, PiiIp}
      s"""WITH dirty AS (
         | SELECT source,
         |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact agent'
         |        || CAST(doc_id AS VARCHAR) || '@example.com now'
         |       WHEN doc_id % 5 = 1 THEN text || ' call 555-'
         |        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
         |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
         |       WHEN doc_id % 5 = 2 THEN text || ' server 10.'
         |        || CAST(doc_id % 256 AS VARCHAR) || '.0.'
         |        || CAST(doc_id % 200 + 1 AS VARCHAR) || ' logged'
         |       ELSE text END AS text
         | FROM documents),
         |c AS (SELECT source,
         |  len(regexp_extract_all(text, '$PiiEmail')) AS he,
         |  len(regexp_extract_all(text, '$PiiPhone')) AS hp,
         |  len(regexp_extract_all(text, '$PiiIp')) AS hi
         | FROM dirty),
         |g AS (SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN he > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_email,
         |  CAST(SUM(he) AS BIGINT) AS s_email,
         |  CAST(SUM(CASE WHEN hp > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_phone,
         |  CAST(SUM(hp) AS BIGINT) AS s_phone,
         |  CAST(SUM(CASE WHEN hi > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_ip,
         |  CAST(SUM(hi) AS BIGINT) AS s_ip
         | FROM c GROUP BY source),
         |u AS (
         | SELECT source, n_docs, 'email' AS pii_type, d_email AS n_docs_hit,
         |  s_email AS n_hits FROM g
         | UNION ALL SELECT source, n_docs, 'phone', d_phone, s_phone FROM g
         | UNION ALL SELECT source, n_docs, 'ipv4', d_ip, s_ip FROM g)
         |SELECT source, n_docs, pii_type, n_docs_hit, n_hits,
         | n_docs_hit * 1000000 // n_docs AS docs_hit_micro FROM u""".stripMargin
    },

    // TextOps.vocabSimpson: unbiased Simpson diversity, exact integers
    // up to one HUGEINT integral division.
    "vocab_simpson" -> {
      val t = normTextSql("text")
      s"""WITH toks AS (SELECT source, unnest(string_split($t, ' ')) AS tok
         |  FROM documents WHERE length($t) > 0),
         |f AS (SELECT source, tok, COUNT(*) AS f FROM toks GROUP BY 1, 2),
         |g AS (SELECT source, CAST(SUM(f) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_types,
         |  SUM(CAST(f AS HUGEINT) * (f - 1)) AS ff,
         |  CAST(MAX(f) AS BIGINT) AS max_f FROM f GROUP BY source)
         |SELECT source, n_tokens, n_types,
         | CAST(CASE WHEN n_tokens >= 2 THEN (ff * 1000000)
         |   // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) ELSE 0 END
         |   AS BIGINT) AS simpson_micro,
         | CAST(CAST(max_f AS HUGEINT) * 1000000 // n_tokens AS BIGINT)
         |   AS top_share_micro
         |FROM g""".stripMargin
    },

    // TextOps.docLengthMad: exact per-source median/MAD order statistics
    // (smallest v with 2·cum ≥ n+1) over bounded value grids.
    "doc_length_mad" ->
      """WITH counts AS (SELECT source, n_chars AS v, COUNT(*) AS m
        | FROM documents GROUP BY 1, 2),
        |medc AS (SELECT source, v,
        |  CAST(SUM(m) OVER (PARTITION BY source ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |  CAST(SUM(m) OVER (PARTITION BY source) AS BIGINT) AS n FROM counts),
        |med AS (SELECT source, n, MIN(v) AS med FROM medc
        | WHERE cum * 2 >= n + 1 GROUP BY source, n),
        |devs AS (SELECT d.source, abs(d.n_chars - med.med) AS v, COUNT(*) AS m
        | FROM documents d JOIN med ON d.source = med.source GROUP BY 1, 2),
        |madc AS (SELECT source, v,
        |  CAST(SUM(m) OVER (PARTITION BY source ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |  CAST(SUM(m) OVER (PARTITION BY source) AS BIGINT) AS n FROM devs),
        |mad AS (SELECT source, MIN(v) AS mad FROM madc
        | WHERE cum * 2 >= n + 1 GROUP BY source)
        |SELECT d.source, med.n AS n_docs, med.med AS median_chars,
        | mad.mad AS mad_chars,
        | CAST(SUM(CASE WHEN abs(d.n_chars - med.med) > mad.mad * 3
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM documents d
        |JOIN med ON d.source = med.source
        |JOIN mad ON d.source = mad.source
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    // AuditOps.erClusters: deletion-variant candidates blocked by nation,
    // exact levenshtein <= 1 verify, min-label connected components.
    "er_clusters" ->
      """WITH RECURSIVE names AS (SELECT c_custkey AS id,
        |  CAST(c_nationkey AS BIGINT) AS nat, c_name AS name FROM customer),
        |ks AS (
        | SELECT DISTINCT id, nat, name, name AS k FROM names
        | UNION
        | SELECT DISTINCT id, nat, name,
        |  substr(name, 1, i - 1) || substr(name, i + 1) AS k
        | FROM (SELECT id, nat, name,
        |   unnest(generate_series(1, length(name))) AS i FROM names)),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b,
        |  a.name AS na, b.name AS nb
        | FROM ks a JOIN ks b ON a.nat = b.nat AND a.k = b.k AND a.id < b.id),
        |pairs AS (SELECT DISTINCT id_a, id_b FROM cand
        | WHERE levenshtein(na, nb) <= 1),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach AS (SELECT DISTINCT src AS node, src AS lbl FROM edges
        |          UNION
        |          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        |lab AS (SELECT node AS c_custkey, MIN(lbl) AS cluster_id
        |        FROM reach GROUP BY node)
        |SELECT c_custkey, cluster_id,
        | COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        | c_custkey = cluster_id AS is_representative
        |FROM lab""".stripMargin,

    // AuditOps.fdAudit: fixed candidate determinant -> dependent set.
    "fd_audit" -> {
      def leg(tab: String, det: String, dep: String) =
        s"""SELECT '$tab' AS tab, '$det' AS determinant, '$dep' AS dependent,
           | CAST(COUNT(*) AS BIGINT) AS n_groups,
           | CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_violating_groups,
           | CAST(SUM(CASE WHEN ndep > 1 THEN nrows ELSE 0 END) AS BIGINT)
           |   AS n_violating_rows
           |FROM (SELECT CAST($det AS VARCHAR) AS d,
           |   COUNT(DISTINCT $dep) AS ndep, COUNT(*) AS nrows
           |  FROM $tab GROUP BY 1)""".stripMargin
      s"""SELECT *, n_violating_groups = 0 AS holds FROM (
         |${leg("customer", "c_name", "c_nationkey")}
         |UNION ALL ${leg("part", "p_brand", "p_type")}
         |UNION ALL ${leg("part", "p_type", "p_brand")}
         |UNION ALL ${leg("orders", "o_custkey", "o_orderstatus")}
         |UNION ALL ${leg("documents", "source", "lang")})""".stripMargin
    },

    // Analytics.groupingSetsProfile: explicit GROUPING SETS with the
    // shared grouping_id bit convention (first column = MSB).
    "grouping_sets_profile" ->
      """WITH base AS (SELECT r_name AS region, c_mktsegment AS segment,
        |  o_totalprice
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey)
        |SELECT region, segment,
        | CAST(GROUPING(region, segment) AS BIGINT) AS gid,
        | COUNT(1) AS n_orders,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |   AS revenue
        |FROM base
        |GROUP BY GROUPING SETS ((region, segment), (region), (segment), ())""".stripMargin,

    // ChangeOps.deltaJoinMaintenance: delta-join IVM accounting; the
    // incremental_total row must equal full_recompute exactly.
    "delta_join_maintenance" -> {
      def leg(name: String, cond: String) =
        s"""SELECT '$name' AS leg, CAST(COUNT(*) AS BIGINT) AS n_rows,
           | CAST(COALESCE(SUM(p) * 1000000, 0) AS BIGINT) AS revenue_micro
           |FROM o JOIN l ON o_orderkey = l_orderkey WHERE $cond""".stripMargin
      s"""WITH o AS (SELECT o_orderkey, o_orderkey % 10 = 0 AS od FROM orders),
         |l AS (SELECT l_orderkey,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1
         |   - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS p,
         |  l_orderkey % 7 = 0 AS ld FROM lineitem),
         |legs AS (
         |${leg("old_view", "NOT od AND NOT ld")}
         |UNION ALL ${leg("delta_orders_join", "od AND NOT ld")}
         |UNION ALL ${leg("delta_lineitem_join", "NOT od AND ld")}
         |UNION ALL ${leg("delta_both_join", "od AND ld")})
         |SELECT leg, n_rows, revenue_micro FROM legs
         |UNION ALL
         |SELECT 'incremental_total', CAST(SUM(n_rows) AS BIGINT),
         | CAST(SUM(revenue_micro) AS BIGINT) FROM legs
         |UNION ALL ${leg("full_recompute", "TRUE")}""".stripMargin
    })

  // ------------------------------------------------- round-10 operators
  private val gRound10: Map[String, String] = Map(
    // StatOps.mannWhitneyU: exact rank-sum with midrank ties, everything
    // doubled so it stays integral; HUGEINT internals, guarded division
    "mann_whitney_u" ->
      """WITH v AS (SELECT
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents,
        |  CASE WHEN l_discount > 0 THEN 1 ELSE 0 END AS grp
        | FROM lineitem),
        |byv AS (SELECT cents,
        |  CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
        |  CAST(COUNT(*) AS BIGINT) AS c
        | FROM v GROUP BY cents),
        |cc AS (SELECT ca, cb, c,
        |  CAST(SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum FROM byv),
        |f AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |  CAST(SUM(cb) AS BIGINT) AS n_b,
        |  SUM(CAST(ca AS HUGEINT) * (2 * (cum - c) + c + 1)) AS r2a
        | FROM cc),
        |u AS (SELECT n_a, n_b,
        |  r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2a FROM f
        | WHERE n_a + n_b > 0)
        |SELECT n_a, n_b, CAST(u2a AS BIGINT) AS u2_a,
        | CAST(CAST(n_a AS HUGEINT) * n_b * 2 - u2a AS BIGINT) AS u2_b,
        | CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |  ELSE (u2a * 1000000) // (CAST(n_a AS HUGEINT) * n_b * 2)
        |  END AS BIGINT) AS auc_micro
        |FROM u""".stripMargin,

    // StatOps.kendallTauDaily: pair census on the calendar-bounded daily
    // table; sign comparisons only; sign-branched integer division
    "kendall_tau_daily" ->
      """WITH daily AS (SELECT
        |  CAST(date_diff('day', DATE '1992-01-01',
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y,
        |  CAST(COUNT(*) AS BIGINT) AS m
        | FROM orders GROUP BY 1),
        |p AS (SELECT
        |  CASE WHEN (b.y > a.y AND b.m > a.m) OR (b.y < a.y AND b.m < a.m)
        |    THEN 1 ELSE 0 END AS conc,
        |  CASE WHEN (b.y > a.y AND b.m < a.m) OR (b.y < a.y AND b.m > a.m)
        |    THEN 1 ELSE 0 END AS disc,
        |  CASE WHEN b.y = a.y AND b.m <> a.m THEN 1 ELSE 0 END AS tie_y,
        |  CASE WHEN b.m = a.m AND b.y <> a.y THEN 1 ELSE 0 END AS tie_m,
        |  CASE WHEN b.y = a.y AND b.m = a.m THEN 1 ELSE 0 END AS tie_both
        | FROM daily a JOIN daily b ON b.t > a.t),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(SUM(conc), 0) AS BIGINT) AS n_concordant,
        |  CAST(COALESCE(SUM(disc), 0) AS BIGINT) AS n_discordant,
        |  CAST(COALESCE(SUM(tie_y), 0) AS BIGINT) AS n_ties_revenue,
        |  CAST(COALESCE(SUM(tie_m), 0) AS BIGINT) AS n_ties_count,
        |  CAST(COALESCE(SUM(tie_both), 0) AS BIGINT) AS n_ties_both
        | FROM p)
        |SELECT *,
        | CAST(CASE WHEN n_concordant >= n_discordant
        |  THEN ((n_concordant - n_discordant)::HUGEINT * 1000000) // n_pairs
        |  ELSE -(((n_discordant - n_concordant)::HUGEINT * 1000000) // n_pairs)
        |  END AS BIGINT) AS tau_a_micro
        |FROM s WHERE n_pairs > 0""".stripMargin,

    // StatOps.spearmanDaily: Pearson over doubled midranks of the daily
    // (revenue, order-count) pair — exact integer rank sums, one final
    // IEEE division/sqrt; zero-variance legs NULL in both engines.
    "spearman_daily" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y,
        |  COUNT(*) AS m
        | FROM orders GROUP BY 1),
        |ry AS (SELECT y, 2 * (SUM(c) OVER (ORDER BY y) - c) + c + 1 AS x
        | FROM (SELECT y, COUNT(*) AS c FROM daily GROUP BY y)),
        |rm AS (SELECT m, 2 * (SUM(c) OVER (ORDER BY m) - c) + c + 1 AS z
        | FROM (SELECT m, COUNT(*) AS c FROM daily GROUP BY m)),
        |j AS (SELECT x, z FROM daily JOIN ry USING (y) JOIN rm USING (m)),
        |a AS (SELECT COUNT(*)::DECIMAL(38,0) AS n,
        |  SUM(x::DECIMAL(38,0)) AS sx, SUM(z::DECIMAL(38,0)) AS sz,
        |  SUM(x::DECIMAL(38,0) * x) AS sxx, SUM(z::DECIMAL(38,0) * z) AS szz,
        |  SUM(x::DECIMAL(38,0) * z) AS sxz
        | FROM j),
        |v AS (SELECT CAST(n AS BIGINT) AS n_days,
        |  CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
        |  CAST(n * szz - sz * sz AS DOUBLE) AS vz,
        |  CAST(n * sxz - sx * sz AS DOUBLE) AS cov
        | FROM a WHERE n > 0)
        |SELECT n_days,
        | CASE WHEN vx > 0 AND vz > 0
        |   THEN ROUND(cov / sqrt(vx * vz), 6) END AS rho_r6
        |FROM v""".stripMargin,

    // StatOps.priorityStatusCramersV: enum×enum contingency effect size;
    // φ²·10⁶ as the SUM OF PER-CELL TRUNCATED micro contributions (the
    // deterministic definition both engines replay) minus 10⁶.
    "priority_status_cramers_v" ->
      """WITH cells AS (SELECT o_orderpriority AS p, o_orderstatus AS s,
        |  COUNT(*) AS obs FROM orders GROUP BY 1, 2),
        |tot AS (SELECT SUM(obs) AS n, COUNT(DISTINCT p) AS nr,
        |  COUNT(DISTINCT s) AS nc FROM cells),
        |m AS (SELECT obs, SUM(obs) OVER (PARTITION BY p) AS rt,
        |  SUM(obs) OVER (PARTITION BY s) AS ct FROM cells),
        |contrib AS (SELECT SUM((CAST(obs AS HUGEINT) * obs * 1000000)
        |  // (CAST(rt AS HUGEINT) * ct)) AS sc FROM m)
        |SELECT CAST(n AS BIGINT) AS n_orders, CAST(nr AS BIGINT) AS n_priorities,
        | CAST(nc AS BIGINT) AS n_statuses,
        | CAST(sc - 1000000 AS BIGINT) AS phi2_micro,
        | CASE WHEN LEAST(nr, nc) > 1 THEN
        |   ROUND(sqrt(GREATEST(CAST(sc - 1000000 AS DOUBLE), 0.0) / 1000000.0
        |     / CAST(LEAST(nr, nc) - 1 AS DOUBLE)), 6) END AS cramers_v_r6
        |FROM tot, contrib WHERE n > 0""".stripMargin,

    // StatOps.runsTestDaily: runs around the exact lower median of daily
    // revenue; expected runs in exact milli-units
    "runs_test_daily" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y
        | FROM orders GROUP BY 1),
        |byv AS (SELECT y, COUNT(*) AS c FROM daily GROUP BY y),
        |cc AS (SELECT y,
        |  CAST(SUM(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum,
        |  CAST(SUM(c) OVER () AS BIGINT) AS n FROM byv),
        |med AS (SELECT MIN(y) AS med FROM cc WHERE cum * 2 >= n),
        |signs AS (SELECT d,
        |  CASE WHEN y > (SELECT med FROM med) THEN 1 ELSE 0 END AS s
        | FROM daily),
        |flips AS (SELECT s,
        |  CASE WHEN lag(s) OVER (ORDER BY d) IS DISTINCT FROM s
        |   THEN 1 ELSE 0 END AS new_run
        | FROM signs)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        | CAST(COALESCE(SUM(s), 0) AS BIGINT) AS n_above,
        | CAST(COUNT(*) - COALESCE(SUM(s), 0) AS BIGINT) AS n_below,
        | CAST(COALESCE(SUM(new_run), 0) AS BIGINT) AS n_runs,
        | CAST(1000 + (2000::HUGEINT * COALESCE(SUM(s), 0) *
        |   (COUNT(*) - COALESCE(SUM(s), 0))) // COUNT(*) AS BIGINT)
        |   AS expected_runs_milli
        |FROM flips HAVING COUNT(*) > 0""".stripMargin,

    // Analytics.giniCustomerConcentration: sorted-cumulative identity on
    // the distinct customer-total grain; HUGEINT internals
    "gini_customer_concentration" ->
      """WITH pc AS (SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS cents
        | FROM orders GROUP BY 1),
        |byv AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c
        | FROM pc GROUP BY cents),
        |cc AS (SELECT cents, c,
        |  CAST(SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum FROM byv),
        |f AS (SELECT CAST(SUM(c) AS BIGINT) AS n_customers,
        |  SUM(CAST(cents AS HUGEINT) * c) AS tot,
        |  SUM(CAST(cents AS HUGEINT) *
        |    (2 * c * (cum - c) + c * (c + 1))) AS s2
        | FROM cc)
        |SELECT n_customers, CAST(tot AS BIGINT) AS total_cents,
        | CAST(CASE WHEN tot = 0 THEN NULL ELSE
        |  ((s2 - (n_customers + 1) * tot) * 1000000) //
        |  (CAST(n_customers AS HUGEINT) * tot) END AS BIGINT) AS gini_micro
        |FROM f WHERE n_customers > 0""".stripMargin,

    // AuditOps.backfillPlan: month spine from the data's own bounds,
    // anti-joined with the present months
    "partition_backfill_plan" ->
      """WITH bounds AS (SELECT
        |  date_trunc('month', MIN(CAST(o_orderdate AS DATE))) AS lo,
        |  date_trunc('month', MAX(CAST(o_orderdate AS DATE))) AS hi
        | FROM orders),
        |months AS (SELECT unnest(generate_series(lo, hi,
        |  INTERVAL 1 MONTH)) AS m FROM bounds WHERE lo IS NOT NULL),
        |spine AS (SELECT strftime(m, '%Y-%m') AS month FROM months),
        |present AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        |  AS month, CAST(COUNT(*) AS BIGINT) AS n_rows
        | FROM orders GROUP BY 1)
        |SELECT s.month, COALESCE(p.n_rows, 0) AS n_rows,
        | p.n_rows IS NULL AS missing
        |FROM spine s LEFT JOIN present p ON s.month = p.month""".stripMargin,

    // StatOps.hodgesLehmannDaily: median of Walsh averages over day
    // pairs, carried as 2·avg cents so everything stays integral
    "hodges_lehmann_daily" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y
        | FROM orders GROUP BY 1),
        |byv AS (SELECT a.y + b.y AS s2, CAST(COUNT(*) AS BIGINT) AS c
        | FROM daily a JOIN daily b ON b.d >= a.d GROUP BY 1),
        |cc AS (SELECT s2, c,
        |  CAST(SUM(c) OVER (ORDER BY s2 ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum FROM byv),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM byv),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        |picks AS (SELECT MIN(s2) AS hl2_lo_cents, MAX(s2) AS hl2_hi_cents
        | FROM cc, tot
        | WHERE (cum - c < (m + 1) // 2 AND (m + 1) // 2 <= cum)
        |    OR (cum - c < m // 2 + 1 AND m // 2 + 1 <= cum))
        |SELECT n_days, m AS n_pairs, hl2_lo_cents, hl2_hi_cents,
        | ((hl2_lo_cents + hl2_hi_cents) * 10) // 4 AS hl_milli_dollars
        |FROM nd, tot, picks WHERE m > 0""".stripMargin,

    // SimilarityOps.embedMarginAudit: top1/top2 cosine margin per query
    // (embed-family 6dp parity policy; margin re-rounded on the grid)
    "embed_margin_audit" -> {
      def dotSql(a: String, b: String) =
        s"list_reduce(list_transform(generate_series(1, 64), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
      s"""WITH pairs AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ROUND(${dotSql("q", "c")} / (sqrt(${dotSql("q", "q")}) * sqrt(${dotSql("c", "c")})), 6)
         |   AS cosine_sim
         | FROM embeddings q JOIN embeddings c
         |  ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, row_number() OVER (
         |  PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id)
         |   AS rank FROM pairs),
         |piv AS (SELECT query_id,
         |  MIN(CASE WHEN rank = 1 THEN neighbor_id END) AS top1_id,
         |  MIN(CASE WHEN rank = 1 THEN cosine_sim END) AS top1_sim,
         |  MIN(CASE WHEN rank = 2 THEN cosine_sim END) AS top2_sim
         | FROM ranked WHERE rank <= 2 GROUP BY query_id)
         |SELECT query_id, top1_id, top1_sim, top2_sim,
         | ROUND(top1_sim - top2_sim, 6) AS margin_r6,
         | ROUND(top1_sim - top2_sim, 6) < 0.05 AS is_ambiguous
         |FROM piv""".stripMargin
    },

    // TextOps.sourceTermLift: exact share-lift keyness, top-k per source
    "source_term_lift" -> {
      val t = normTextSql("text")
      s"""WITH toks AS (SELECT source, unnest(string_split($t, ' ')) AS tok
         |  FROM documents WHERE length($t) > 0),
         |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS a
         | FROM toks GROUP BY 1, 2),
         |tt AS (SELECT tok, CAST(SUM(a) AS BIGINT) AS tf FROM st GROUP BY 1),
         |stot AS (SELECT source, CAST(SUM(a) AS BIGINT) AS ns
         | FROM st GROUP BY 1),
         |n AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM st),
         |lift AS (SELECT st.source, st.tok, st.a, tt.tf,
         |  CAST((CAST(st.a AS HUGEINT) * n.n * 1000000) //
         |    (CAST(tt.tf AS HUGEINT) * stot.ns) AS BIGINT) AS lift_micro
         | FROM st JOIN tt ON st.tok = tt.tok
         | JOIN stot ON st.source = stot.source
         | CROSS JOIN n
         | WHERE tt.tf >= 5),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
         |  ORDER BY lift_micro DESC, tok) AS BIGINT) AS rank FROM lift)
         |SELECT source, tok, rank, a AS tf_source, tf AS tf_corpus,
         | lift_micro
         |FROM r WHERE rank <= 10""".stripMargin
    })

  private val hRound11: Map[String, String] = Map(
    // TrendOps.ccfOrdersRevenue: lead-lag Pearson between daily order
    // count and daily revenue; exact integer sufficient sums, one final
    // IEEE division/sqrt; zero-variance legs NULL in both engines.
    "ccf_orders_revenue" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y,
        |  CAST(COUNT(*) AS BIGINT) AS m
        | FROM orders GROUP BY 1),
        |lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-7, 8)),
        |p AS (
        | SELECT l.lag, a.m AS x, b.y AS y2
        | FROM daily a CROSS JOIN lags l
        | JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)),
        |s AS (
        | SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
        |  CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y2) AS HUGEINT) AS sy,
        |  CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |  CAST(SUM(CAST(y2 AS HUGEINT) * y2) AS HUGEINT) AS syy,
        |  CAST(SUM(CAST(x AS HUGEINT) * y2) AS HUGEINT) AS sxy
        | FROM p GROUP BY lag)
        |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
        | CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0
        |       AND CAST(n*syy - sy*sy AS DOUBLE) > 0
        |  THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE) /
        |   sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
        |        CAST(n*syy - sy*sy AS DOUBLE)), 4) END AS ccf
        |FROM s""".stripMargin,

    // StatOps.levenePriorityDispersion: Brown-Forsythe W across order
    // priorities from truncated-micro group moments of |usd - median|;
    // the final W is one double expression over exact integers.
    "levene_priority_dispersion" ->
      """WITH cdf AS (SELECT o_orderpriority AS grp,
        |  CAST(floor(o_totalprice) AS BIGINT) AS usd, COUNT(*) AS n
        | FROM orders GROUP BY 1, 2),
        |c2 AS (SELECT grp, usd, n,
        |  SUM(n) OVER (PARTITION BY grp ORDER BY usd
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(n) OVER (PARTITION BY grp) AS total FROM cdf),
        |med AS (SELECT grp, MIN(CASE WHEN cum * 2 >= total THEN usd END)
        |  AS med FROM c2 GROUP BY grp),
        |g AS (SELECT c2.grp, MAX(med) AS median_usd,
        |  CAST(SUM(n) AS HUGEINT) AS ng,
        |  SUM(CAST(abs(usd - med) AS HUGEINT) * n) AS sg,
        |  SUM(CAST(abs(usd - med) AS HUGEINT) * abs(usd - med) * n) AS qg
        | FROM c2 JOIN med USING (grp) GROUP BY c2.grp),
        |t AS (SELECT *, (sg * 1000000) // ng AS m_micro,
        |  (qg * 1000000) // ng AS msq_micro,
        |  SUM(sg) OVER () AS st, SUM(ng) OVER () AS nt,
        |  CAST(COUNT(*) OVER () AS HUGEINT) AS k FROM g),
        |u AS (SELECT *,
        |  msq_micro - (m_micro * m_micro) // 1000000 AS var_micro,
        |  (st * 1000000) // nt AS gm_micro FROM t),
        |v AS (SELECT *,
        |  SUM(ng * (m_micro - gm_micro) * (m_micro - gm_micro)) OVER ()
        |    AS a_tot,
        |  SUM(ng * var_micro) OVER () AS b_tot FROM u)
        |SELECT grp AS o_orderpriority, CAST(ng AS BIGINT) AS n_orders,
        | median_usd, CAST(m_micro AS BIGINT) AS mean_absdev_micro,
        | CASE WHEN k > 1 AND b_tot > 0 THEN
        |  ROUND(CAST(nt - k AS DOUBLE) * CAST(a_tot AS DOUBLE) /
        |   (CAST(k - 1 AS DOUBLE) * CAST(b_tot AS DOUBLE) * 1e6), 6)
        |  END AS bf_w_r6
        |FROM v""".stripMargin,

    // StatOps.jackknifeNationRevenue: leave-one-nation-out replicates of
    // the global mean order value, micro-truncated; SE from exact
    // integer squared deviations.
    "jackknife_nation_revenue" ->
      """WITH bn AS (SELECT n_name AS nation, CAST(COUNT(*) AS HUGEINT) AS ng,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS HUGEINT)
        |    AS sg
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
        |t AS (SELECT *, SUM(ng) OVER () AS nt, SUM(sg) OVER () AS st
        | FROM bn),
        |f AS (SELECT * FROM t WHERE nt > ng),
        |l AS (SELECT *, CAST(COUNT(*) OVER () AS HUGEINT) AS gcnt,
        |  ((st - sg) * 1000000) // (nt - ng) AS loo_micro FROM f),
        |r AS (SELECT *, (SUM(loo_micro) OVER ()) // gcnt AS rep_mean_micro
        | FROM l),
        |d AS (SELECT *, CAST(loo_micro - rep_mean_micro AS HUGEINT)
        |   * (loo_micro - rep_mean_micro) AS dev2 FROM r),
        |e AS (SELECT *, SUM(dev2) OVER () AS sdev2 FROM d)
        |SELECT nation, CAST(ng AS BIGINT) AS n_orders,
        | CAST(loo_micro AS BIGINT) AS loo_mean_microcents,
        | CASE WHEN gcnt > 1 THEN
        |  ROUND(sqrt(CAST(gcnt - 1 AS DOUBLE) * CAST(sdev2 AS DOUBLE) /
        |   CAST(gcnt AS DOUBLE)) / 1e6, 6) END AS jk_se_cents_r6
        |FROM e""".stripMargin,

    // SurvivalOps.nelsonAalenConversion: right-censored cumulative
    // hazard over the bounded duration-hour grid; truncated nano terms,
    // exact integer prefix sum.
    "nelson_aalen_conversion" ->
      """WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) + 1209600
        |  AS cut_s FROM events),
        |su AS (SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS s_s
        | FROM events WHERE event_type = 'signup' GROUP BY 1),
        |elig AS (SELECT su.user_id, s_s, cut_s FROM su, b
        | WHERE s_s <= cut_s),
        |pu AS (SELECT e.user_id,
        |  MIN(CASE WHEN CAST(floor(epoch(ev.ts)) AS BIGINT) >= e.s_s
        |        AND CAST(floor(epoch(ev.ts)) AS BIGINT) <= e.cut_s
        |       THEN CAST(floor(epoch(ev.ts)) AS BIGINT) END) AS p_s
        | FROM elig e LEFT JOIN events ev ON ev.user_id = e.user_id
        |  AND ev.event_type = 'purchase'
        | GROUP BY 1),
        |durs AS (SELECT CASE WHEN p_s IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |  (COALESCE(p_s, cut_s) - s_s) // 3600 AS h
        | FROM elig LEFT JOIN pu USING (user_id)),
        |byh AS (SELECT h, CAST(SUM(ev) AS BIGINT) AS d,
        |  CAST(COUNT(*) AS BIGINT) AS w FROM durs GROUP BY 1),
        |g AS (SELECT h, d, w - d AS c,
        |  SUM(w) OVER () - COALESCE(SUM(w) OVER (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        | FROM byh),
        |hz AS (SELECT *, (d * 1000000000) // n_risk AS hazard_nano FROM g),
        |cum AS (SELECT *, SUM(hazard_nano) OVER (ORDER BY h
        |  ROWS UNBOUNDED PRECEDING) AS ch FROM hz)
        |SELECT h AS dur_h, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
        | c AS n_censored, CAST(hazard_nano AS BIGINT) AS hazard_nano,
        | CAST(ch AS BIGINT) AS cum_hazard_nano
        |FROM cum WHERE d > 0""".stripMargin,

    // SurvivalOps.kaplanMeierConversion: the same grid folded through
    // the integer recurrence S <- floor(S*(n-d)/n) from 10^12 — the
    // oracle unrolls it as a recursive CTE over the indexed grid.
    "kaplan_meier_conversion" ->
      """WITH RECURSIVE b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT)
        |  + 1209600 AS cut_s FROM events),
        |su AS (SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS s_s
        | FROM events WHERE event_type = 'signup' GROUP BY 1),
        |elig AS (SELECT su.user_id, s_s, cut_s FROM su, b
        | WHERE s_s <= cut_s),
        |pu AS (SELECT e.user_id,
        |  MIN(CASE WHEN CAST(floor(epoch(ev.ts)) AS BIGINT) >= e.s_s
        |        AND CAST(floor(epoch(ev.ts)) AS BIGINT) <= e.cut_s
        |       THEN CAST(floor(epoch(ev.ts)) AS BIGINT) END) AS p_s
        | FROM elig e LEFT JOIN events ev ON ev.user_id = e.user_id
        |  AND ev.event_type = 'purchase'
        | GROUP BY 1),
        |durs AS (SELECT CASE WHEN p_s IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |  (COALESCE(p_s, cut_s) - s_s) // 3600 AS h
        | FROM elig LEFT JOIN pu USING (user_id)),
        |byh AS (SELECT h, CAST(SUM(ev) AS BIGINT) AS d,
        |  CAST(COUNT(*) AS BIGINT) AS w FROM durs GROUP BY 1),
        |g AS (SELECT h, d, w - d AS c,
        |  SUM(w) OVER () - COALESCE(SUM(w) OVER (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk,
        |  CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS idx
        | FROM byh),
        |km(i, surv) AS (
        | SELECT CAST(0 AS BIGINT), CAST(1000000000000 AS HUGEINT)
        | UNION ALL
        | SELECT g.idx, CASE WHEN g.d > 0
        |   THEN (km.surv * (g.n_risk - g.d)) // g.n_risk ELSE km.surv END
        | FROM km JOIN g ON g.idx = km.i + 1)
        |SELECT g.h AS dur_h, CAST(g.n_risk AS BIGINT) AS n_risk,
        | g.d AS n_events, g.c AS n_censored,
        | CAST(km.surv AS BIGINT) AS km_surv_e12
        |FROM km JOIN g ON g.idx = km.i
        |WHERE g.d > 0""".stripMargin,

    // GraphOps.nationHopDistance: BFS over the top-96 strongest trade
    // lanes (rank-sparsified, ties by name); recursion bounded at 6
    // hops, deduped frontier, min hop count per pair.
    "nation_hop_distance" ->
      """WITH RECURSIVE ls AS (SELECT DISTINCT l_orderkey, n_name AS src
        | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey),
        |os AS (SELECT o_orderkey, n_name AS dst FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey),
        |pairs AS (SELECT src, dst, COUNT(*) AS cnt
        | FROM ls JOIN os ON l_orderkey = o_orderkey GROUP BY 1, 2),
        |backbone AS (SELECT src, dst FROM pairs WHERE src <> dst
        | ORDER BY cnt DESC, src, dst LIMIT 96),
        |r(s, v, d) AS (
        | SELECT n_name, n_name, CAST(0 AS BIGINT) FROM nation
        | UNION
        | SELECT r.s, t.dst, r.d + 1 FROM r JOIN backbone t ON t.src = r.v
        | WHERE r.d < 6)
        |SELECT s AS src_nation, v AS dst_nation, MIN(d) AS hops
        |FROM r GROUP BY 1, 2""".stripMargin,

    // StatOps.welchWeekendRevenue: unequal-variance t between weekend
    // and weekday daily revenue; exact pivoted moments, v1/v0 shared
    // double columns, fixed expression tree.
    "welch_weekend_revenue" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y
        | FROM orders GROUP BY 1),
        |g AS (SELECT CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS we,
        |  CAST(COUNT(*) AS HUGEINT) AS n, SUM(CAST(y AS HUGEINT)) AS s,
        |  SUM(CAST(y AS HUGEINT) * y) AS q FROM daily GROUP BY 1),
        |p AS (SELECT
        |  COALESCE(SUM(CASE WHEN we = 1 THEN n END), 0) AS n1,
        |  SUM(CASE WHEN we = 1 THEN s END) AS s1,
        |  SUM(CASE WHEN we = 1 THEN q END) AS q1,
        |  COALESCE(SUM(CASE WHEN we = 0 THEN n END), 0) AS n0,
        |  SUM(CASE WHEN we = 0 THEN s END) AS s0,
        |  SUM(CASE WHEN we = 0 THEN q END) AS q0
        | FROM g),
        |a AS (SELECT *, n1 * q1 - s1 * s1 AS a1, n0 * q0 - s0 * s0 AS a0
        | FROM p WHERE n1 + n0 > 0),
        |v AS (SELECT *,
        |  CAST(a1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
        |    * CAST(n1 - 1 AS DOUBLE)) AS v1,
        |  CAST(a0 AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)
        |    * CAST(n0 - 1 AS DOUBLE)) AS v0
        | FROM a)
        |SELECT CAST(n1 AS BIGINT) AS n_weekend,
        | CAST(n0 AS BIGINT) AS n_weekday,
        | CASE WHEN n1 > 0 AND n0 > 0 THEN CAST((s1 * 1000000) // n1
        |   - (s0 * 1000000) // n0 AS BIGINT) END AS mean_diff_microcents,
        | CASE WHEN n1 > 1 AND n0 > 1 AND v1 + v0 > 0 THEN
        |  ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt(v1 + v0), 4)
        |  END AS welch_t_r4,
        | CASE WHEN n1 > 1 AND n0 > 1 AND (v1 > 0 OR v0 > 0) THEN
        |  ROUND((v1 + v0) * (v1 + v0) / (v1 * v1 / CAST(n1 - 1 AS DOUBLE)
        |    + v0 * v0 / CAST(n0 - 1 AS DOUBLE)), 2) END AS welch_df_r2
        |FROM v""".stripMargin,

    // StatOps.kruskalWeekdayRevenue: rank one-way ANOVA across weekdays
    // over doubled midranks; H a single fixed 7-term double expression.
    "kruskal_weekday_revenue" -> {
      val pivots = (1 to 7).map(i =>
        s"|  COALESCE(SUM(CASE WHEN dow = $i THEN n END), 0) AS n$i,\n" +
          s"|  COALESCE(SUM(CASE WHEN dow = $i THEN sr END), 0) AS r$i")
        .mkString(",\n")
      val terms = (1 to 7).map(i =>
        s"CASE WHEN n$i > 0 THEN CAST(r$i AS DOUBLE) * CAST(r$i AS DOUBLE)" +
          s" / CAST(n$i AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END")
        .mkString("\n|  + ")
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         |    AS y
         | FROM orders GROUP BY 1),
         |dd AS (SELECT CAST(isodow(d) AS BIGINT) AS dow, y FROM daily),
         |byv AS (SELECT y, COUNT(*) AS c FROM dd GROUP BY y),
         |rr AS (SELECT y,
         |  2 * (SUM(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - c)
         |    + c + 1 AS r2
         | FROM byv),
         |g AS (SELECT dow, CAST(COUNT(*) AS HUGEINT) AS n,
         |  SUM(CAST(r2 AS HUGEINT)) AS sr
         | FROM dd JOIN rr USING (y) GROUP BY dow),
         |ties AS (SELECT COALESCE(SUM(CAST(c AS HUGEINT) * c * c - c),
         |  0) AS tsum FROM byv),
         |p AS (SELECT
         $pivots
         | FROM g),
         |t AS (SELECT *, n1 + n2 + n3 + n4 + n5 + n6 + n7 AS n FROM p
         | WHERE n1 + n2 + n3 + n4 + n5 + n6 + n7 >= 2),
         |hh AS (SELECT *, CAST(3.0 AS DOUBLE) * (
         |  $terms
         | ) / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
         | - CAST(3.0 AS DOUBLE) * CAST(n + 1 AS DOUBLE) AS h,
         | CAST(1.0 AS DOUBLE) - CAST(tsum AS DOUBLE)
         |  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
         |     - CAST(n AS DOUBLE)) AS corr
         | FROM t, ties)
         |SELECT CAST(n AS BIGINT) AS n_days, ROUND(h, 6) AS h_r6,
         | CASE WHEN corr > 0 THEN ROUND(h / corr, 6) END AS h_tie_corr_r6
         |FROM hh""".stripMargin
    },

    // SurvivalOps.logrankConversionAb: two-sample log-rank between the
    // md5-parity A/B arms over the censored conversion grid; truncated
    // micro expectation/variance terms, Z one double expression.
    "ab_conversion_logrank" ->
      """WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) + 1209600
        |  AS cut_s FROM events),
        |su AS (SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS s_s
        | FROM events WHERE event_type = 'signup' GROUP BY 1),
        |elig AS (SELECT su.user_id, s_s, cut_s FROM su, b
        | WHERE s_s <= cut_s),
        |pu AS (SELECT e.user_id,
        |  MIN(CASE WHEN CAST(floor(epoch(ev.ts)) AS BIGINT) >= e.s_s
        |        AND CAST(floor(epoch(ev.ts)) AS BIGINT) <= e.cut_s
        |       THEN CAST(floor(epoch(ev.ts)) AS BIGINT) END) AS p_s
        | FROM elig e LEFT JOIN events ev ON ev.user_id = e.user_id
        |  AND ev.event_type = 'purchase'
        | GROUP BY 1),
        |durs AS (SELECT
        |  ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |    ::BIGINT % 2 AS arm,
        |  CASE WHEN p_s IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |  (COALESCE(p_s, cut_s) - s_s) // 3600 AS h
        | FROM elig LEFT JOIN pu USING (user_id)),
        |byh AS (SELECT h,
        |  CAST(COALESCE(SUM(CASE WHEN arm = 1 THEN ev END), 0) AS BIGINT)
        |    AS d1,
        |  CAST(COUNT(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS w1,
        |  CAST(COALESCE(SUM(CASE WHEN arm = 0 THEN ev END), 0) AS BIGINT)
        |    AS d0,
        |  CAST(COUNT(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS w0
        | FROM durs GROUP BY 1),
        |risk AS (SELECT *,
        |  SUM(w1) OVER () AS nt1, SUM(w0) OVER () AS nt0,
        |  SUM(w1) OVER () - COALESCE(SUM(w1) OVER (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        |  SUM(w0) OVER () - COALESCE(SUM(w0) OVER (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
        | FROM byh),
        |terms AS (SELECT *, d1 + d0 AS dt, n1 + n0 AS n,
        |  (CAST(d1 + d0 AS HUGEINT) * n1 * 1000000) // (n1 + n0) AS e1,
        |  (CAST(n1 AS HUGEINT) * 1000000) // (n1 + n0) AS fa,
        |  (CAST(n0 AS HUGEINT) * 1000000) // (n1 + n0) AS fb,
        |  CASE WHEN n1 + n0 > 1 THEN
        |    (CAST(n1 + n0 - d1 - d0 AS HUGEINT) * 1000000) // (n1 + n0 - 1)
        |   ELSE 0 END AS fc
        | FROM risk WHERE d1 + d0 > 0),
        |vt AS (SELECT *,
        |  (CAST((CAST(dt AS HUGEINT) * fa * fb) // 1000000 AS HUGEINT)
        |    * fc) // 1000000 AS v
        | FROM terms),
        |agg AS (SELECT MAX(nt0) AS n_users_a, MAX(nt1) AS n_users_b,
        |  COALESCE(SUM(d0), 0) AS conv_a, COALESCE(SUM(d1), 0) AS conv_b,
        |  COALESCE(SUM(CAST(e1 AS HUGEINT)), 0) AS e1_micro,
        |  COALESCE(SUM(CAST(v AS HUGEINT)), 0) AS v_micro
        | FROM vt)
        |SELECT CAST(n_users_a AS BIGINT) AS n_users_a,
        | CAST(n_users_b AS BIGINT) AS n_users_b,
        | CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
        | CAST(e1_micro AS BIGINT) AS expected_b_micro,
        | CAST(v_micro AS BIGINT) AS variance_micro,
        | CASE WHEN v_micro > 0 THEN
        |  ROUND((CAST(conv_b AS DOUBLE) * 1000000.0
        |    - CAST(e1_micro AS DOUBLE))
        |    / sqrt(CAST(v_micro AS DOUBLE) * 1000000.0), 4)
        |  END AS logrank_z_r4
        |FROM agg WHERE n_users_a IS NOT NULL""".stripMargin,

    // AsOfOps.positionAttribution: U-shaped 40/20/40 credit over the
    // linear_attribution window; first/last by fixed-width sortable key,
    // middle-pool remainder to the first touch's type.
    "position_attribution" ->
      """WITH e AS (
        | SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |  event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents
        | FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |c AS (
        | SELECT *, COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w
        |    AS nv,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS nc,
        |  MIN(CASE WHEN event_type IN ('view', 'click') THEN
        |    lpad(CAST(ts_s AS VARCHAR), 16, '0')
        |    || lpad(CAST(event_id AS VARCHAR), 20, '0') || event_type END)
        |    OVER w AS fk,
        |  MAX(CASE WHEN event_type IN ('view', 'click') THEN
        |    lpad(CAST(ts_s AS VARCHAR), 16, '0')
        |    || lpad(CAST(event_id AS VARCHAR), 20, '0') || event_type END)
        |    OVER w AS lk
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |   RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW)),
        |p AS (
        | SELECT cents, nv, nc, nv + nc AS n,
        |  substr(fk, 37, 16) AS ft, substr(lk, 37, 16) AS lt,
        |  (cents * 2) // 5 AS f40, (cents * 2) // 5 AS l40,
        |  cents - (cents * 2) // 5 - (cents * 2) // 5 AS pool
        | FROM c WHERE event_type = 'purchase'),
        |q AS (SELECT *,
        |  CASE WHEN n >= 3 THEN pool // (n - 2) END AS base,
        |  CASE WHEN n >= 3 THEN pool % (n - 2) END AS rem,
        |  nv - (CASE WHEN ft = 'view' THEN 1 ELSE 0 END)
        |     - (CASE WHEN lt = 'view' THEN 1 ELSE 0 END) AS nmv,
        |  nc - (CASE WHEN ft = 'click' THEN 1 ELSE 0 END)
        |     - (CASE WHEN lt = 'click' THEN 1 ELSE 0 END) AS nmc
        | FROM p),
        |cr AS (SELECT *,
        |  CASE WHEN n = 0 THEN 0
        |   WHEN n = 1 THEN CASE WHEN ft = 'view' THEN cents ELSE 0 END
        |   WHEN n = 2 THEN (CASE WHEN ft = 'view' THEN cents // 2
        |     + cents % 2 ELSE 0 END)
        |    + (CASE WHEN lt = 'view' THEN cents // 2 ELSE 0 END)
        |   ELSE (CASE WHEN ft = 'view' THEN f40 + rem ELSE 0 END)
        |    + (CASE WHEN lt = 'view' THEN l40 ELSE 0 END)
        |    + nmv * base END AS cv,
        |  CASE WHEN n = 0 THEN 0
        |   WHEN n = 1 THEN CASE WHEN ft = 'click' THEN cents ELSE 0 END
        |   WHEN n = 2 THEN (CASE WHEN ft = 'click' THEN cents // 2
        |     + cents % 2 ELSE 0 END)
        |    + (CASE WHEN lt = 'click' THEN cents // 2 ELSE 0 END)
        |   ELSE (CASE WHEN ft = 'click' THEN f40 + rem ELSE 0 END)
        |    + (CASE WHEN lt = 'click' THEN l40 ELSE 0 END)
        |    + nmc * base END AS cc
        | FROM q),
        |x AS (
        | SELECT 'view' AS touch_type, cv AS credit_cents FROM cr
        | UNION ALL SELECT 'click', cc FROM cr
        | UNION ALL SELECT 'organic',
        |  CASE WHEN n = 0 THEN cents ELSE 0 END FROM cr)
        |SELECT touch_type,
        | CAST(COUNT(CASE WHEN credit_cents > 0 THEN 1 END) AS BIGINT)
        |   AS n_credited_purchases,
        | ROUND(SUM(credit_cents) / 100.0, 2) AS credit
        |FROM x GROUP BY 1""".stripMargin,

    // TrendOps.weekdayRevenueEnvelope: exact type-1 P10/P50/P90 of
    // daily revenue per weekday from the shared per-dow CDF.
    "weekday_revenue_envelope" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y
        | FROM orders GROUP BY 1),
        |dd AS (SELECT CAST(isodow(d) AS BIGINT) AS dow, y FROM daily),
        |byv AS (SELECT dow, y, COUNT(*) AS c FROM dd GROUP BY 1, 2),
        |cdf AS (SELECT dow, y, c,
        |  SUM(c) OVER (PARTITION BY dow ORDER BY y
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(c) OVER (PARTITION BY dow) AS total FROM byv)
        |SELECT dow, CAST(MAX(total) AS BIGINT) AS n_days,
        | MIN(CASE WHEN cum * 10 >= total THEN y END) AS p10_cents,
        | MIN(CASE WHEN cum * 2 >= total THEN y END) AS p50_cents,
        | MIN(CASE WHEN cum * 10 >= total * 9 THEN y END) AS p90_cents
        |FROM cdf GROUP BY dow""".stripMargin,

    // TrendOps.weekdayOutlierDays: days beyond k=3 weekday-MADs from
    // their weekday median; integer-cent comparisons throughout.
    "weekday_outlier_days" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y
        | FROM orders GROUP BY 1),
        |dd AS (SELECT d, CAST(isodow(d) AS BIGINT) AS dow, y FROM daily),
        |byv AS (SELECT dow, y, COUNT(*) AS c FROM dd GROUP BY 1, 2),
        |cdf AS (SELECT dow, y, c,
        |  SUM(c) OVER (PARTITION BY dow ORDER BY y
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(c) OVER (PARTITION BY dow) AS total FROM byv),
        |med AS (SELECT dow, MIN(CASE WHEN cum * 2 >= total THEN y END)
        |  AS med FROM cdf GROUP BY dow),
        |dev AS (SELECT d, dd.dow, y, med, abs(y - med) AS dev
        | FROM dd JOIN med USING (dow)),
        |devv AS (SELECT dow, dev AS v, COUNT(*) AS c FROM dev GROUP BY 1, 2),
        |dcdf AS (SELECT dow, v, c,
        |  SUM(c) OVER (PARTITION BY dow ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(c) OVER (PARTITION BY dow) AS total FROM devv),
        |mad AS (SELECT dow, MIN(CASE WHEN cum * 2 >= total THEN v END)
        |  AS mad FROM dcdf GROUP BY dow)
        |SELECT d, dev.dow, y AS revenue_cents, med AS dow_median_cents,
        | mad AS dow_mad_cents, dev AS abs_dev_cents
        |FROM dev JOIN mad USING (dow)
        |WHERE dev > mad * 3 AND dev > 0""".stripMargin,

    // TrendOps.medianPolishWeekday: two-sweep Tukey median polish of
    // the week x weekday grid; exact lower-median order statistics,
    // topK residual cells with deterministic tie-break.
    "median_polish_weekday" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |    AS BIGINT) AS t,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y
        | FROM orders GROUP BY 1, 2),
        |g0 AS (SELECT d, t // 7 AS w, CAST(isodow(d) AS BIGINT) AS dow,
        |  y AS res, y FROM daily),
        |r1 AS (SELECT w, (list(res ORDER BY res))
        |  [CAST((COUNT(*) + 1) // 2 AS INT)] AS dr1 FROM g0 GROUP BY w),
        |g1 AS (SELECT d, g0.w, dow, res - dr1 AS res, y, dr1
        | FROM g0 JOIN r1 USING (w)),
        |c1 AS (SELECT dow, (list(res ORDER BY res))
        |  [CAST((COUNT(*) + 1) // 2 AS INT)] AS dc1 FROM g1 GROUP BY dow),
        |g2 AS (SELECT d, w, g1.dow, res - dc1 AS res, y, dr1, dc1
        | FROM g1 JOIN c1 USING (dow)),
        |r2 AS (SELECT w, (list(res ORDER BY res))
        |  [CAST((COUNT(*) + 1) // 2 AS INT)] AS dr2 FROM g2 GROUP BY w),
        |g3 AS (SELECT d, g2.w, dow, res - dr2 AS res, y, dr1, dc1, dr2
        | FROM g2 JOIN r2 USING (w)),
        |c2 AS (SELECT dow, (list(res ORDER BY res))
        |  [CAST((COUNT(*) + 1) // 2 AS INT)] AS dc2 FROM g3 GROUP BY dow),
        |g4 AS (SELECT d, w, g3.dow, res - dc2 AS res, y, dr1, dc1, dr2,
        |  dc2 FROM g3 JOIN c2 USING (dow))
        |SELECT d, w, dow, y AS revenue_cents,
        | dr1 + dr2 AS week_effect_cents, dc1 + dc2 AS dow_effect_cents,
        | res AS residual_cents
        |FROM g4 ORDER BY abs(res) DESC, w, dow LIMIT 20""".stripMargin,

    // TrendOps.changepointSingleSplit: exact one-level binary
    // segmentation; per-candidate gain the same fixed double expression
    // in both engines, ties to the earliest date.
    "changepoint_single_split" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS y
        | FROM orders GROUP BY 1),
        |c AS (SELECT d, SUM(CAST(y AS HUGEINT)) OVER (ORDER BY d
        |    ROWS UNBOUNDED PRECEDING) AS sl,
        |  CAST(row_number() OVER (ORDER BY d) AS HUGEINT) AS nl
        | FROM daily),
        |t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |  SUM(CAST(y AS HUGEINT)) AS s FROM daily),
        |g AS (SELECT d, nl, n - nl AS nr, sl, s - sl AS sr,
        |  CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
        |  + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
        |    / CAST(n - nl AS DOUBLE)
        |  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS gain
        | FROM c, t WHERE nl < n)
        |SELECT d AS split_after, CAST(nl AS BIGINT) AS n_left,
        | CAST(nr AS BIGINT) AS n_right,
        | CAST((sl * 1000000) // nl AS BIGINT) AS mean_left_micro,
        | CAST((sr * 1000000) // nr AS BIGINT) AS mean_right_micro,
        | ROUND(gain / 1e4, 2) AS gain_usd2_r2
        |FROM g ORDER BY gain DESC, d LIMIT 1""".stripMargin,

    // TrendOps.pacfDailyRevenue: partial autocorrelation via the
    // unrolled Durbin-Levinson recursion — the phi/e expression strings
    // come from the SAME generator (OracleSql.levinsonSteps) Spark
    // executes, so the double trees are identical by construction.
    "pacf_daily_revenue" -> {
      val maxLag = 7
      val pivs = (1 to maxLag).map(k =>
        s"|  SUM(CASE WHEN lag = $k THEN n END) AS n$k,\n" +
          s"|  SUM(CASE WHEN lag = $k THEN sx END) AS hx$k,\n" +
          s"|  SUM(CASE WHEN lag = $k THEN sy END) AS hy$k,\n" +
          s"|  SUM(CASE WHEN lag = $k THEN sxy END) AS xy$k").mkString(",\n")
      val rChain = (1 to maxLag).map { k =>
        s"|ra$k AS (SELECT *, nn * nn * xy$k - nn * s * (hx$k + hy$k)" +
          s" + n$k * s * s AS a$k FROM ${if (k == 1) "one" else s"rb${k - 1}"}),\n" +
          s"|rb$k AS (SELECT *, case when a0 > 0 and n$k is not null\n" +
          s"| then cast(a$k as double) / cast(a0 as double) end AS r$k" +
          s" FROM ra$k)"
      }.mkString(",\n")
      val levNames = graft.OracleSql.levinsonSteps(maxLag)
      val levChain = levNames.zipWithIndex.map { case ((name, sql), i) =>
        val prev = if (i == 0) s"rb$maxLag" else s"lv${i - 1}"
        s"|lv$i AS (SELECT *, $sql AS $name FROM $prev)"
      }.mkString(",\n")
      val last = s"lv${levNames.length - 1}"
      val out = (1 to maxLag).map(k =>
        s"|SELECT CAST($k AS BIGINT) AS lag, ROUND(p_${k}_$k, 6) AS pacf_r6" +
          s" FROM $last").mkString("\n|UNION ALL\n")
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         |    AS y
         | FROM orders GROUP BY 1),
         |lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, ${maxLag + 1})),
         |pr AS (SELECT l.lag, a.y AS x, b.y AS y2
         | FROM daily a CROSS JOIN lags l
         | JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)),
         |ag AS (SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
         |  CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y2) AS HUGEINT) AS sy,
         |  CAST(SUM(CAST(x AS HUGEINT) * y2) AS HUGEINT) AS sxy
         | FROM pr GROUP BY lag),
         |piv AS (SELECT
         $pivs
         | FROM ag),
         |tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
         |  CAST(SUM(y) AS HUGEINT) AS s,
         |  SUM(CAST(y AS HUGEINT) * y) AS q FROM daily),
         |one AS (SELECT *, nn * nn * q - nn * s * s AS a0 FROM piv, tot),
         $rChain,
         $levChain
         $out""".stripMargin
    },

    // ExperimentOps.abCupedReadout: CUPED variance-reduced A/B readout
    // over md5-parity arms; exact pooled/arm moments, raw effect in
    // truncated micro, theta/effect/rho^2/SRM fixed double expressions.
    "ab_cuped_readout" ->
      """WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) + 1296000
        |  AS split_s FROM events),
        |u AS (SELECT user_id,
        |  ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |    ::BIGINT % 2 AS arm,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |    AND CAST(floor(epoch(ts)) AS BIGINT) < split_s
        |    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        |    AS HUGEINT) AS x,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |    AND CAST(floor(epoch(ts)) AS BIGINT) >= split_s
        |    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        |    AS HUGEINT) AS y
        | FROM events, b WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |pool AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
        |  SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy,
        |  SUM(y * y) AS syy FROM u),
        |arms AS (SELECT
        |  COALESCE(SUM(CASE WHEN arm = 0 THEN 1 END), 0)::HUGEINT AS n0,
        |  COALESCE(SUM(CASE WHEN arm = 0 THEN x END), 0)::HUGEINT AS sx0,
        |  COALESCE(SUM(CASE WHEN arm = 0 THEN y END), 0)::HUGEINT AS sy0,
        |  COALESCE(SUM(CASE WHEN arm = 1 THEN 1 END), 0)::HUGEINT AS n1,
        |  COALESCE(SUM(CASE WHEN arm = 1 THEN x END), 0)::HUGEINT AS sx1,
        |  COALESCE(SUM(CASE WHEN arm = 1 THEN y END), 0)::HUGEINT AS sy1
        | FROM u),
        |m AS (SELECT *, n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
        |  n * sxy - sx * sy AS cxy FROM pool, arms WHERE n > 0),
        |d AS (SELECT *,
        |  CASE WHEN vx > 0 THEN CAST(cxy AS DOUBLE) / CAST(vx AS DOUBLE)
        |   END AS theta FROM m)
        |SELECT CAST(n0 AS BIGINT) AS n_users_a,
        | CAST(n1 AS BIGINT) AS n_users_b,
        | CASE WHEN n0 + n1 > 0 THEN
        |  ROUND((CAST(n1 AS DOUBLE) - CAST(n0 AS DOUBLE))
        |   / sqrt(CAST(n1 + n0 AS DOUBLE)), 4) END AS srm_z_r4,
        | ROUND(theta, 6) AS theta_r6,
        | CASE WHEN n1 > 0 AND n0 > 0 THEN
        |   CAST((sy1 * 1000000) // n1 - (sy0 * 1000000) // n0 AS BIGINT)
        |  END AS effect_raw_microcents,
        | CASE WHEN n1 > 0 AND n0 > 0 AND theta IS NOT NULL THEN
        |  ROUND((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |   - theta * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)), 4)
        |  END AS effect_cuped_cents_r4,
        | CASE WHEN vx > 0 AND vy > 0 THEN
        |  ROUND(CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE)
        |    / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6)
        |  END AS var_reduction_r6
        |FROM d""".stripMargin,

    // Analytics.amsF2UserActivity: CountSketch-bucketed AMS F2 estimate
    // (k=1024 signed buckets x 3 reps, md5 bucket/sign hashes) vs the
    // exact second moment; signed permille error with the sign-branch.
    "ams_f2_user_activity" ->
      """WITH freq AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
        | FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |reps AS (SELECT CAST(range AS BIGINT) AS r FROM range(0, 3)),
        |cells AS (SELECT r,
        |  ('0x' || substr(md5('b' || CAST(r AS VARCHAR) || ':' ||
        |    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 1024 AS b,
        |  CASE WHEN ('0x' || substr(md5('s' || CAST(r AS VARCHAR) || ':' ||
        |    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
        |   THEN 1 ELSE -1 END AS sgn, f
        | FROM freq CROSS JOIN reps),
        |xb AS (SELECT r, b, SUM(CAST(sgn AS HUGEINT) * f) AS x
        | FROM cells GROUP BY 1, 2),
        |est AS (SELECT r, SUM(x * x) AS est FROM xb GROUP BY r),
        |m AS (SELECT est AS med FROM (SELECT est, row_number()
        |  OVER (ORDER BY est, r) AS rk FROM est) WHERE rk = 2),
        |exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  SUM(CAST(f AS HUGEINT) * f) AS f2 FROM freq)
        |SELECT n_users, CAST(f2 AS BIGINT) AS f2_exact,
        | CAST(med AS BIGINT) AS ams_median_est,
        | CAST(CASE WHEN med >= f2 THEN ((med - f2) * 1000) // f2
        |  ELSE -(((f2 - med) * 1000) // f2) END AS BIGINT) AS err_permille
        |FROM exact, m
        |WHERE n_users > 0""".stripMargin)

  /** Shared staged CTE chain of the 4-step sequential pattern (signup →
    * view → click(value ≥ 10) → purchase, window 259200 s): anchor
    * propagation a1→a3 over RANGE frames, first-matching-step tie rank,
    * achieved level read highest-first — ends in CTE `a`(user_id, ts_s,
    * rk, ach). Mirror of PatternOps.staged on signupFunnelSteps.
    */
  private val seqPatternStagedSql: String =
    """WITH e AS (
      | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |  event_type, value
      | FROM events
      | WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |  AND (event_type IN ('signup', 'view', 'purchase')
      |       OR (event_type = 'click' AND value >= 10.0))),
      |r AS (SELECT *,
      |  CASE WHEN event_type = 'signup' THEN 0
      |       WHEN event_type = 'view' THEN 1
      |       WHEN event_type = 'click' AND value >= 10.0 THEN 2
      |       ELSE 3 END AS rk FROM e),
      |s1 AS (SELECT *,
      |  MAX(CASE WHEN event_type = 'signup' THEN ts_s END) OVER w AS a1
      | FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
      |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s2 AS (SELECT *,
      |  MAX(CASE WHEN event_type = 'view' THEN a1 END) OVER w AS a2
      | FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
      |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s3 AS (SELECT *,
      |  MAX(CASE WHEN event_type = 'click' AND value >= 10.0 THEN a2 END)
      |    OVER w AS a3
      | FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
      |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |a AS (SELECT user_id, ts_s, rk,
      |  CASE WHEN event_type = 'purchase' AND a3 >= ts_s - 259200 THEN 4
      |       WHEN event_type = 'click' AND value >= 10.0
      |         AND a2 >= ts_s - 259200 THEN 3
      |       WHEN event_type = 'view' AND a1 >= ts_s - 259200 THEN 2
      |       WHEN event_type = 'signup' THEN 1 ELSE 0 END AS ach
      | FROM s3)""".stripMargin

  /** Shared DuckDB chain of the unigram-LM trainer (UnigramLmOps): word
    * rollup → candidate substring counts → fixed vocab → init
    * likelihoods → two Viterbi-EM rounds. The whole DP (42 lookup
    * pivots, 12 unrolled b/backpointer levels, backpointer walk) is
    * generated from the SAME SQL snippets the Spark plan compiles, so
    * the IEEE double recurrence is bit-identical by construction. Ends
    * with CTEs vocab0, cf1/cf2 (per-round vocab counts), p2 (final
    * likelihoods), and rb2_<MaxWordLen> (the round-2 segmentation frame
    * the encoder reads).
    */
  private val unigramChainSql: String = {
    import graft.operators.UnigramLmOps._
    val pivotCols = slots.map { case (j, l) =>
      s"MAX(CASE WHEN j = $j AND l = $l THEN p_nano END) AS p_${j}_$l"
    }.mkString(", ")
    def mStep(r: Int, src: String, cCol: String): String =
      s"p$r AS (SELECT piece, CAST(greatest(1, (CAST($cCol AS HUGEINT) " +
        s"* 1000000000) // NULLIF((SELECT SUM($cCol) FROM $src), 0)) " +
        s"AS BIGINT) AS p_nano FROM $src)"
    def round(r: Int): String = {
      val dp = (1 to MaxWordLen).map { j =>
        s"d${r}_$j AS (SELECT *, ${bSql(j)} AS b_$j FROM " +
          s"${if (j == 1) s"piv$r" else s"e${r}_${j - 1}"}),\n" +
        s"e${r}_$j AS (SELECT *, ${bpSql(j)} AS bp_$j FROM d${r}_$j)"
      }.mkString(",\n")
      val rec = (1 to MaxWordLen).map { t =>
        s"ra${r}_$t AS (SELECT *, ${lenSql(t)} AS len_$t FROM " +
          s"${if (t == 1) s"r${r}_0" else s"rb${r}_${t - 1}"}),\n" +
        s"rb${r}_$t AS (SELECT *, ${pieceColSql(t)} AS piece_$t, " +
          s"${posSql(t)} AS pos_$t FROM ra${r}_$t)"
      }.mkString(",\n")
      s"""look$r AS (SELECT s.w, s.n, s.j, s.l, p.p_nano
         | FROM subjl s LEFT JOIN p${r - 1} p
         |   ON p.piece = substring(s.w, CAST(s.j - s.l + 1 AS INT),
         |     CAST(s.l AS INT))),
         |piv$r AS (SELECT w, n, $pivotCols FROM look$r GROUP BY w, n),
         |$dp,
         |r${r}_0 AS (SELECT *, CAST(length(w) AS INT) AS pos_0
         | FROM e${r}_$MaxWordLen),
         |$rec,
         |pc$r AS (SELECT n, unnest([${(1 to MaxWordLen)
            .map(t => s"piece_$t").mkString(", ")}]) AS piece
         | FROM rb${r}_$MaxWordLen),
         |cc$r AS (SELECT piece, SUM(n) AS c FROM pc$r
         | WHERE piece IS NOT NULL GROUP BY 1),
         |cf$r AS (SELECT v.piece, COALESCE(cc.c, 0) AS c
         | FROM (SELECT piece FROM vocab0) v
         | LEFT JOIN cc$r cc USING (piece)),
         |${mStep(r, s"cf$r", "c")}""".stripMargin
    }
    s"""WITH words AS (
       | SELECT w, COUNT(*) AS n FROM (
       |  SELECT unnest(CASE WHEN length(norm) = 0 THEN []
       |    ELSE string_split(norm, ' ') END) AS w
       |  FROM (SELECT ${normTextSql("text")} AS norm FROM documents))
       | WHERE length(w) BETWEEN 1 AND $MaxWordLen GROUP BY w),
       |subj AS (SELECT w, n,
       |  unnest(generate_series(1, CAST(length(w) AS BIGINT))) AS j
       | FROM words),
       |subjl AS (SELECT w, n, j,
       |  unnest(generate_series(1, least($MaxPieceLen, j))) AS l
       | FROM subj),
       |sub AS (SELECT substring(w, CAST(j - l + 1 AS INT),
       |   CAST(l AS INT)) AS piece, SUM(n) AS c0
       | FROM subjl GROUP BY 1),
       |vocab0 AS (
       | SELECT piece, c0 FROM sub WHERE length(piece) = 1
       | UNION ALL
       | SELECT piece, c0 FROM (SELECT piece, c0 FROM sub
       |  WHERE length(piece) >= 2 ORDER BY c0 DESC, piece
       |  LIMIT $VocabMulti)),
       |${mStep(0, "vocab0", "c0")},
       |${round(1)},
       |${round(2)}""".stripMargin
  }

  private val iRound12: Map[String, String] = Map(
    // AuditOps.dpReleaseCounts: geometric-mechanism (discrete Laplace)
    // DP release of the (lang, source) composition table. The CASE
    // ladder is generated from the SAME driver-computed micro-CDF
    // thresholds the Spark plan inlines, so the noise replays exactly;
    // noisy counts below the stability threshold are withheld.
    "dp_release_counts" -> {
      val ladder = graft.operators.AuditOps.DpGeomCdfMicro
        .map { case (z, t) => s"WHEN u < $t THEN ($z)" }
        .mkString("CASE ", " ", s" ELSE ${graft.operators.AuditOps.DpNoiseClampZ} END")
      s"""WITH grp AS (
         | SELECT lang, source, COUNT(*) AS g FROM documents GROUP BY 1, 2),
         |h AS (SELECT lang, source, g,
         |  (${hash32Sql("'dp:' || lang || ':' || source")} * 1000000)
         |    // 4294967296 AS u
         | FROM grp),
         |z AS (SELECT lang, source, g, $ladder AS z FROM h)
         |SELECT lang, source, CAST(g + z AS BIGINT) AS released_count,
         | CAST(1000000 AS BIGINT) AS epsilon_micro
         |FROM z WHERE g + z >= 5""".stripMargin
    },

    // UnigramLmOps.unigramLmVocab: SentencePiece-style unigram-LM
    // trainer, 2 unrolled Viterbi-EM rounds over the fixed candidate
    // vocab (shared chain: see unigramChainSql).
    "unigram_lm_vocab" ->
      s"""$unigramChainSql
         |SELECT v.piece, CAST(length(v.piece) AS BIGINT) AS piece_len,
         | CAST(v.c0 AS BIGINT) AS init_count,
         | CAST(f1.c AS BIGINT) AS em1_count,
         | CAST(f2.c AS BIGINT) AS em2_count, p2.p_nano AS p_nano
         |FROM vocab0 v
         |JOIN cf1 f1 USING (piece) JOIN cf2 f2 USING (piece)
         |JOIN p2 USING (piece)""".stripMargin,

    // UnigramLmOps.unigramEncode: apply the round-2 trained model to
    // every document — per-word piece counts from the same segmentation
    // frame, per-doc fertility in exact integer micro-units.
    "unigram_encode" -> {
      import graft.operators.UnigramLmOps._
      val nPieces = (1 to MaxWordLen)
        .map(t => s"CASE WHEN piece_$t IS NOT NULL THEN 1 ELSE 0 END")
        .mkString("CAST(", " + ", " AS BIGINT)")
      s"""$unigramChainSql,
         |wp AS (SELECT w, $nPieces AS n_pieces FROM rb2_$MaxWordLen),
         |dw AS (SELECT doc_id,
         |  unnest(CASE WHEN length(norm) = 0 THEN []
         |    ELSE string_split(norm, ' ') END) AS w
         | FROM (SELECT doc_id, ${normTextSql("text")} AS norm
         |   FROM documents)),
         |dwf AS (SELECT doc_id, w FROM dw
         | WHERE length(w) BETWEEN 1 AND $MaxWordLen)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         | CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
         | CAST((SUM(n_pieces) * 1000000) // COUNT(*) AS BIGINT)
         |   AS fertility_micro
         |FROM dwf JOIN wp USING (w) GROUP BY doc_id""".stripMargin
    },

    // ExperimentOps.abWilsonBounds: per-arm Wilson 95% score interval
    // with z = 49/25 exact — one sqrt, exact-isqrt corrected, all other
    // terms HUGEINT rationals; conversion = user ever purchased.
    "ab_wilson_bounds" ->
      """WITH pu AS (SELECT user_id,
        |  ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |    ::BIGINT % 2 AS arm,
        |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        | FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |ar AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS c FROM pu GROUP BY 1),
        |t AS (SELECT arm, n, c,
        |  (2500::HUGEINT * c * (n - c) + 2401::HUGEINT * n) * n AS an
        | FROM ar),
        |t2 AS (SELECT *,
        |  CAST(floor(sqrt(CAST(an AS DOUBLE))) AS BIGINT) AS s1 FROM t),
        |t2b AS (SELECT *, (s1 + (an // s1)) // 2 AS s2 FROM t2),
        |t3 AS (SELECT *,
        |  CASE WHEN CAST(s2 + 1 AS HUGEINT) * (s2 + 1) <= an THEN s2 + 1
        |   WHEN CAST(s2 AS HUGEINT) * s2 > an THEN s2 - 1
        |   ELSE s2 END AS s,
        |  1250::HUGEINT * n * c + 2401::HUGEINT * n AS num,
        |  1250::HUGEINT * n * n + 4802::HUGEINT * n AS den
        | FROM t2b)
        |SELECT CAST(arm AS BIGINT) AS arm, CAST(n AS BIGINT) AS n_users,
        | CAST(c AS BIGINT) AS n_converted,
        | CAST((c * 1000000) // n AS BIGINT) AS p_micro,
        | CAST(((num - 49::HUGEINT * s) * 1000000) // den AS BIGINT)
        |   AS wilson_lo_micro,
        | CAST(((num + 49::HUGEINT * s) * 1000000) // den AS BIGINT)
        |   AS wilson_hi_micro
        |FROM t3""".stripMargin,

    // TrendOps.revenueDiscords: exact matrix-profile discord scan of
    // daily revenue — 7-day window pivot, calendar-bounded pair scan
    // with the |i−j| ≥ 7 trivial-match guard, min-SSD profile, top-5 by
    // exact HUGEINT SSD, exact-isqrt L2 readout.
    "revenue_discords" -> {
      val ys = (0 until 7).map(k =>
        s"MAX(CASE WHEN k = $k THEN y END) AS y_$k").mkString(", ")
      val ssd = (0 until 7).map(k =>
        s"CAST(a.y_$k - b.y_$k AS HUGEINT) * (a.y_$k - b.y_$k)")
        .mkString(" + ")
      s"""WITH daily AS (
         | SELECT CAST(o_orderdate AS DATE) AS d,
         |  CAST(date_diff('day', DATE '1992-01-01',
         |    CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
         | FROM orders GROUP BY 1, 2),
         |ke AS (SELECT t - ks.k AS i, ks.k, y, d FROM daily,
         |  (SELECT unnest(generate_series(0, 6)) AS k) ks),
         |win AS (SELECT i, MAX(CASE WHEN k = 0 THEN d END) AS d_start, $ys
         | FROM ke GROUP BY i HAVING COUNT(*) = 7),
         |pairs AS (SELECT a.i AS ia, b.i AS ib, ($ssd) AS ssd
         | FROM win a JOIN win b ON b.i >= a.i + 7),
         |mp AS (SELECT i, MIN(ssd) AS mp FROM (
         |  SELECT ia AS i, ssd FROM pairs
         |  UNION ALL SELECT ib AS i, ssd FROM pairs)
         | GROUP BY i),
         |top AS (SELECT w.i, w.d_start, mp.mp FROM win w JOIN mp USING (i)
         | ORDER BY mp.mp DESC, w.i LIMIT 5),
         |s AS (SELECT i, d_start, mp,
         |  CAST(floor(sqrt(CAST(mp AS DOUBLE))) AS BIGINT) AS s1 FROM top),
         |s2 AS (SELECT *, CASE WHEN s1 <= 0 THEN s1
         |  ELSE (s1 + (mp // s1)) // 2 END AS s2 FROM s)
         |SELECT i AS t_start, d_start,
         | CAST(CASE WHEN CAST(s2 + 1 AS HUGEINT) * (s2 + 1) <= mp THEN s2 + 1
         |  WHEN CAST(s2 AS HUGEINT) * s2 > mp THEN s2 - 1
         |  ELSE s2 END AS BIGINT) AS l2_dist_cents
         |FROM s2""".stripMargin
    },

    // PatternOps.seqPatternMatch: 4-step signup→view→click(≥10)→purchase
    // pattern compiled to running-maxima RANGE windows; the CTE chain is
    // the same anchor propagation (a_k = latest signup ts backing a
    // validated length-k prefix), ach reads checks highest-first.
    "seq_pattern_match" ->
      s"""$seqPatternStagedSql,
         |pu AS (SELECT user_id, CAST(MAX(ach) AS BIGINT) AS pattern_level
         |  FROM a GROUP BY 1)
         |SELECT pattern_level, CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST((COUNT(*) * 1000000) // SUM(COUNT(*)) OVER () AS BIGINT)
         |   AS user_share_micro
         |FROM pu GROUP BY 1""".stripMargin,

    // PatternOps.seqPatternProgress: per-event emissions whenever the
    // user's deepest validated prefix grows — running best over the
    // (ts, first-matching-step) ROWS order on the same staged frame.
    "seq_pattern_progress" ->
      s"""$seqPatternStagedSql,
         |b AS (SELECT user_id, ts_s,
         |  MAX(ach) OVER wc AS best,
         |  COALESCE(MAX(ach) OVER wp, 0) AS prev_best
         | FROM a WINDOW
         |  wc AS (PARTITION BY user_id ORDER BY ts_s, rk
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wp AS (PARTITION BY user_id ORDER BY ts_s, rk
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT user_id, ts_s, CAST(best AS BIGINT) AS pattern_level
         |FROM b WHERE best > prev_best""".stripMargin)

  val all: Map[String, String] =
    aCleaning ++ bStarSchema ++ cAnalytics ++ dPipeline ++ dExtras ++
      eStreaming ++ fRound9 ++ gRound10 ++ hRound11 ++ iRound12
}
