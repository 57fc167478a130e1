package graft

/** The SQL surface a reference user would migrate to: tables as temp
  * views + spark.sql text queries, including graft's registered native
  * functions.
  */
class SqlInterfaceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val registered: Unit = {
    Seq("orders", "customer", "nation", "region", "lineitem").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  test("plain-SQL star query runs against the views") {
    registered
    val df = spark.sql(
      """SELECT r_name AS region, COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin)
    assert(df.count() == 5)
  }

  test("graft_geohash is callable from SQL") {
    registered
    val gh = spark.sql(
      "SELECT graft_geohash(40.7128D, -74.0060D, 7) AS gh").head.getString(0)
    assert(gh == functions.GeohashEncode.encode(40.7128, -74.0060, 7).toString)
  }

  test("window + decimal SQL matches the DataFrame operator") {
    registered
    val viaSql = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = {
      import org.apache.spark.sql.functions._
      Tables.orders(spark, dir).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n")).orderBy("o_orderpriority")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(viaSql == viaDf)
  }

  test("graft aggregators are callable from SQL") {
    registered
    // top-3 order cents across all orders == ORDER BY DESC LIMIT 3
    val viaAgg = spark.sql(
      """SELECT graft_topk3(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |FROM orders""".stripMargin).head.getSeq[Long](0)
    val viaSort = spark.sql(
      """SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |FROM orders ORDER BY c DESC LIMIT 3""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(viaAgg == viaSort)
    // heavy hitters: exact vs GROUP BY when distinct keys ≤ capacity
    val hh = spark.sql(
      "SELECT graft_heavy_hitters16(o_orderpriority) FROM orders")
      .head.getMap[String, Long](0)
    val exact = spark.sql(
      "SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh.toMap == exact)
  }

  test("bloom and cms sketches are callable from SQL") {
    registered
    // bloom: build over even custkeys, probe both parities — no false
    // negatives on members
    val bloomHits = spark.sql(
      """WITH b AS (SELECT graft_bloom_agg(c_custkey) AS w FROM customer
        |           WHERE c_custkey % 2 = 0)
        |SELECT COUNT(*) FROM customer, b
        |WHERE c_custkey % 2 = 0 AND NOT graft_bloom_contains(w, c_custkey)
        |""".stripMargin).head.getLong(0)
    assert(bloomHits == 0L)
    // cms: estimates over a low-cardinality key are exact
    val cms = spark.sql(
      """WITH s AS (SELECT graft_cms_agg(o_orderpriority) AS g FROM orders)
        |SELECT o_orderpriority,
        |  MAX(graft_cms_estimate(g, o_orderpriority)) AS est, COUNT(*) AS n
        |FROM orders, s GROUP BY o_orderpriority
        |""".stripMargin).collect()
    assert(cms.nonEmpty && cms.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("text/hash/vector primitives are callable from SQL and match the Column API") {
    registered
    import org.apache.spark.sql.functions._
    // md5-prefix hash
    val viaSql = spark.sql("SELECT graft_hash64('abc', 8)").head.getLong(0)
    val viaCol = spark.range(1)
      .select(functions.HashFns.hash32(lit("abc"))).head.getLong(0)
    assert(viaSql == viaCol)
    // minhash signature + shingle set + simhash agree with the Column API
    val t = "the quick brown fox jumps over the lazy dog"
    val sqlRow = spark.sql(
      s"""SELECT graft_minhash_sig('$t', 5) AS sig,
         |  graft_shingle_set('$t', 5) AS xs, graft_simhash('$t') AS sh
         |""".stripMargin).head
    val colRow = spark.range(1).select(
      functions.MinhashSig.signature(lit(t), 5).as("sig"),
      functions.MinhashSig.distinctShingles(lit(t), 5).as("xs"),
      functions.MinhashSig.simhash(lit(t)).as("sh")).head
    assert(sqlRow.getSeq[Long](0) == colRow.getSeq[Long](0))
    assert(sqlRow.getSeq[Long](1) == colRow.getSeq[Long](1))
    assert(sqlRow.getLong(2) == colRow.getLong(2))
    // span hashes over a token array
    val spans = spark.sql(
      "SELECT graft_span_hashes(array('a','b','c','d'), 2, 8)").head.getSeq[Long](0)
    assert(spans.length == 3)
    // dot product on float arrays
    val dot = spark.sql(
      """SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<FLOAT>))""".stripMargin)
      .head.getDouble(0)
    assert(dot == 11.0)
  }
}
