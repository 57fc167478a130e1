package graft

/** End-to-end smoke: every declared query runs against sf0.001 and the
  * flagship entry returns rows (the driver's t1 contract).
  */
class EntrySmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry and events queries survive a FOREIGN session (NTZ inference on)") {
    // the driver's smoke check calls entry(spark) with its own session,
    // which does NOT carry our parquet configs: timestamp[us] columns
    // then read as TIMESTAMP_NTZ and only the Tables.fixNtz loader
    // shim stands between that and an analysis error (the round-4
    // testdata-regeneration incident)
    val foreign = spark.newSession()
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    assert(SparkEntry.entry(foreign).count() > 0)
    assert(SparkEntry.queries("clean_events")(foreign, dir).count() > 0)
    assert(SparkEntry.queries("events_sessionize")(foreign, dir).count() > 0)
  }

  test("a non-UTC foreign session reads the SAME timestamp values, not just rows") {
    // fixNtz must pin the NTZ wall clock to UTC semantics in every
    // session zone: a bare NTZ→LTZ cast would shift epochs by the
    // session offset and silently corrupt every event-time computation
    // in a foreign non-UTC session
    import org.apache.spark.sql.functions.{col, min, sum, unix_micros}
    def fingerprint(s: org.apache.spark.sql.SparkSession): (Long, Long) = {
      val r = Tables.events(s, dir)
        .agg(min(unix_micros(col("ts"))).as("mn"),
          sum(unix_micros(col("ts"))).as("sm")).head()
      (r.getLong(0), r.getLong(1))
    }
    val home = fingerprint(spark)
    val foreign = spark.newSession()
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    assert(fingerprint(foreign) == home,
      "foreign-session epochs must equal the UTC-pinned session's")
  }

  test("every oracle key has a query and vice versa (weaker rows-only ops aside)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o.diff(q)}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      assert(fn(spark, dir).count() >= 0)
    }
  }
}
