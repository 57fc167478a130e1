package graft.sources

import graft.SparkSpec

/** JDBC warehouse path, driven end-to-end against an embedded Derby —
  * the sandbox stand-in for the reference's Redshift serving layer
  * (predicate-pushdown read, range-partitioned parallel read, batched
  * write, idempotent keyed upsert).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def conn() = java.sql.DriverManager.getConnection(url)

  private def exec(sql: String): Unit = {
    val c = conn()
    try { val st = c.createStatement(); st.execute(sql); st.close() }
    finally c.close()
  }

  private def seed(): Unit = {
    exec("CREATE TABLE src_orders (id BIGINT PRIMARY KEY, region VARCHAR(20), amount DOUBLE)")
    val c = conn()
    try {
      val ps = c.prepareStatement("INSERT INTO src_orders VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i)
        ps.setString(2, if (i % 2 == 0) "EU" else "US")
        ps.setDouble(3, i * 10.0)
        ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    } finally c.close()
  }

  seed()

  test("jdbc read pulls the table and pushes filters into the database") {
    val df = Readers.jdbc(spark, url, "src_orders", props)
    assert(df.count() == 100)
    val filtered = df.filter($"region" === "EU").select("id", "amount")
    assert(filtered.count() == 50)
    // the region predicate must compile into the generated JDBC query,
    // not run as a post-scan Spark filter over the full wire transfer
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.toUpperCase.contains("EQUALTO(REGION,EU)"),
      s"filter must push into the scan:\n${plan.take(500)}")
  }

  test("jdbcPartitioned opens one stripe per partition and loses no rows") {
    val df = Readers.jdbcPartitioned(spark, url, "src_orders",
      "id", lowerBound = 1L, upperBound = 101L, numPartitions = 4, props)
    assert(df.rdd.getNumPartitions == 4, "4 concurrent stripes")
    assert(df.count() == 100)
    assert(df.agg(org.apache.spark.sql.functions.sum($"id")).head.getLong(0)
      == (1L to 100L).sum)
  }

  test("writeJdbc appends batched partitions; Spark creates the table") {
    val df = (1 to 40).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    Sinks.writeJdbc(df, url, "loaded", batchSize = 7, props = props)
    assert(Readers.jdbc(spark, url, "loaded", props).count() == 40)
    Sinks.writeJdbc(df, url, "loaded", batchSize = 7, props = props)
    assert(Readers.jdbc(spark, url, "loaded", props).count() == 80,
      "append mode stacks; idempotent loads go through writeJdbcUpsert")
  }

  test("writeJdbcUpsert is idempotent and updates changed rows in place") {
    exec("CREATE TABLE dim_cust (ck BIGINT PRIMARY KEY, seg VARCHAR(20), spend DOUBLE)")
    val v1 = Seq((1L, "BUILDING", 10.0), (2L, "AUTO", 20.0), (3L, "AUTO", 30.0))
      .toDF("ck", "seg", "spend")
    Sinks.writeJdbcUpsert(v1, url, "dim_cust", Seq("ck"))
    Sinks.writeJdbcUpsert(v1, url, "dim_cust", Seq("ck")) // retry converges
    val after1 = Readers.jdbc(spark, url, "dim_cust", props)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(after1 == Map(1L -> (("BUILDING", 10.0)), 2L -> (("AUTO", 20.0)),
      3L -> (("AUTO", 30.0))))
    // second load: one changed row, one new row, one untouched
    val v2 = Seq((2L, "MACHINERY", 25.0), (4L, "HOUSEHOLD", 40.0))
      .toDF("ck", "seg", "spend")
    Sinks.writeJdbcUpsert(v2, url, "dim_cust", Seq("ck"))
    val after2 = Readers.jdbc(spark, url, "dim_cust", props)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(after2 == Map(1L -> (("BUILDING", 10.0)), 2L -> (("MACHINERY", 25.0)),
      3L -> (("AUTO", 30.0)), 4L -> (("HOUSEHOLD", 40.0))))
  }

  test("writeJdbcUpsert handles NULL values and all-key tables") {
    exec("CREATE TABLE nulls_t (k BIGINT PRIMARY KEY, v VARCHAR(20))")
    val df = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("k", "v")
    Sinks.writeJdbcUpsert(df, url, "nulls_t", Seq("k"))
    val got = Readers.jdbc(spark, url, "nulls_t", props)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("a"), 2L -> None))
    // membership table: every column is a key — the existence probe path
    exec("CREATE TABLE seen_t (k BIGINT PRIMARY KEY)")
    val keys = Seq(1L, 2L).toDF("k")
    Sinks.writeJdbcUpsert(keys, url, "seen_t", Seq("k"))
    Sinks.writeJdbcUpsert(keys, url, "seen_t", Seq("k"))
    assert(Readers.jdbc(spark, url, "seen_t", props).count() == 2)
  }

  test("identifier validation: non-identifier table/column names fail before any SQL is built") {
    val df = Seq((1L, "x")).toDF("k", "v")
    // identifiers are interpolated into statement text (JDBC can't bind
    // them) — anything beyond a plain identifier is rejected loudly
    intercept[IllegalArgumentException] {
      Sinks.writeJdbcUpsert(df, url, "bad table; DROP TABLE t", Seq("k"), props = props)
    }
    intercept[IllegalArgumentException] {
      Sinks.writeJdbcUpsert(df.withColumnRenamed("v", "v x"), url, "ok_t", Seq("k"), props = props)
    }
    intercept[IllegalArgumentException] {
      Sinks.jdbcLastCommitted(url, "bad-table", "s1", props)
    }
    intercept[IllegalArgumentException] {
      Sinks.jdbcMarkCommitted(url, "x\"y", "s1", 0L, props)
    }
    // one schema qualifier stays accepted (Derby's default schema)
    exec("CREATE TABLE ident_ok (k BIGINT PRIMARY KEY, v VARCHAR(20))")
    Sinks.writeJdbcUpsert(df, url, "APP.ident_ok", Seq("k"), props = props)
    assert(Readers.jdbc(spark, url, "APP.ident_ok", props).count() == 1)
  }

  test("jdbcUpsertStream: live serving load with in-database batch markers") {
    exec("CREATE TABLE serve_t (k BIGINT PRIMARY KEY, v VARCHAR(30))")
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.jdbcUpsertStream(
      mem.toDF().toDF("k", "v"), url, "serve_t", Seq("k"), "serve1", props)
      .start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((2L, "b2"), (3L, "c")) // update + insert in batch 1
    q.processAllAvailable(); q.stop()
    val got = Readers.jdbc(spark, url, "serve_t", props).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // both batch markers live in the database itself
    assert(Sinks.jdbcLastCommitted(url, "serve_t", "serve1", props)
      .contains(1L))
  }

  test("jdbcUpsertStream replay: marked batch skips, unmarked crash converges") {
    exec("CREATE TABLE serve_r (k BIGINT PRIMARY KEY, v VARCHAR(30))")
    import graft.streaming.EventStreams.jdbcUpsertBatch
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(jdbcUpsertBatch(b0, 0L, url, "serve_r", Seq("k"), "r1", props))
    // replay of a MARKED batch is a no-op: feed different content so a
    // wrongly-applied replay would be visible, not masked by idempotence
    val poison = Seq((1L, "SHOULD_NOT_LAND")).toDF("k", "v")
    assert(!jdbcUpsertBatch(poison, 0L, url, "serve_r", Seq("k"), "r1", props))
    // crash window: batch 1's upsert landed but the marker never did
    val b1 = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    Sinks.writeJdbcUpsert(b1, url, "serve_r", Seq("k"), props = props)
    assert(Sinks.jdbcLastCommitted(url, "serve_r", "r1", props).contains(0L))
    // the replayed batch re-applies (idempotent upsert) and marks
    assert(jdbcUpsertBatch(b1, 1L, url, "serve_r", Seq("k"), "r1", props))
    val got = Readers.jdbc(spark, url, "serve_r", props).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(Sinks.jdbcLastCommitted(url, "serve_r", "r1", props).contains(1L))
    // marker namespacing: a successor stream starts from scratch
    assert(Sinks.jdbcLastCommitted(url, "serve_r", "r2", props).isEmpty)
  }

  test("serving demo: finalized sessions stream end-to-end into the warehouse") {
    // the reference's full loop — events → sessionization → warehouse
    // serving table — as ONE live path: sessionFinalizeStream closes
    // sessions, jdbcUpsertStream lands them exactly-once in Derby
    exec("CREATE TABLE sessions_fact (user_id BIGINT NOT NULL, " +
      "session_start BIGINT NOT NULL, session_end BIGINT, n_events BIGINT, " +
      "duration_s BIGINT, PRIMARY KEY (user_id, session_start))")
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.SessionEv]
    val closed = EventStreams.sessionFinalizeStream(spark, mem.toDS())
    val q = EventStreams.jdbcUpsertStream(closed.toDF(), url, "sessions_fact",
      Seq("user_id", "session_start"), "sess1", props, outputMode = "append")
      .start()
    def ev(id: Long, user: Long, minute: Long) = EventStreams.SessionEv(
      user, id, new java.sql.Timestamp(1704067200000L + minute * 60000L))
    mem.addData(ev(1, 7L, 0), ev(2, 7L, 10)) // one session, 10 min
    q.processAllAvailable()
    mem.addData(ev(3, 7L, 120)) // 110-min gap closes it inline
    q.processAllAvailable(); q.stop()
    val rows = Readers.jdbc(spark, url, "sessions_fact", props).collect()
      .map(r => (r.getLong(0), r.getLong(2) - r.getLong(1), r.getLong(3)))
    assert(rows.toSeq == Seq((7L, 600L, 2L)),
      s"expected user 7's closed 10-minute 2-event session, got ${rows.toSeq}")
  }
}
