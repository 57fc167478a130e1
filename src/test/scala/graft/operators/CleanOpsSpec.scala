package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  test("priceClean strips currency symbols and thousands separators") {
    // the operator's regexp handles commas even though the synthesized
    // testdata strings don't contain them
    val df = Seq((1L, "$1,234.56"), (2L, "789.10")).toDF("o_orderkey", "price_raw")
    val out = df.select(
      org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.col("price_raw"), "[$,]", "")
        .cast("decimal(18,2)").as("price"))
      .collect().map(_.getDecimal(0).toString).sorted
    assert(out.toSeq == Seq("1234.56", "789.10"))
  }

  test("cleanEvents filters range, normalizes type, dedups by id") {
    val ts = Timestamp.valueOf("2024-01-01 10:30:00")
    val df = Seq(
      (1L, ts, 10L, " click ", 5.0, "{}"),
      (1L, ts, 10L, " click ", 5.0, "{}"),     // dup event_id
      (2L, ts, 11L, "view", 9999.0, "{}"),     // out of range
      (3L, ts, 12L, "buy", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = CleanOps.cleanEvents(df).orderBy("event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out.head.getString(2) == "CLICK")
    assert(out.head.getInt(5) == 10) // event_hour
  }

  test("parseTimestamps round-trips all four formats including AM/PM") {
    val ts = Timestamp.valueOf("2024-03-05 14:15:16")
    val df = Seq((0L, ts, 1L, "x", 1.0, "{}"), (1L, ts, 1L, "x", 1.0, "{}"),
      (2L, ts, 1L, "x", 1.0, "{}"), (3L, ts, 1L, "x", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = CleanOps.parseTimestamps(df).collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getTimestamp(2) == ts))
    // event_id 1 and 2 produced AM/PM raw strings
    val rawByIdx = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rawByIdx(1L).endsWith("PM") && rawByIdx(2L).endsWith("PM"))
  }

  test("parseTimestamps normalizes local wall-clock to UTC across DST") {
    def row(id: Long, s: String) =
      (id, Timestamp.valueOf(s), 1L, "x", 1.0, "{}")
    val df = Seq(
      row(0L, "2024-01-15 12:00:00"),  // EST: UTC-5
      row(4L, "2024-06-15 12:00:00"),  // EDT: UTC-4
      row(8L, "2024-11-03 01:30:00"),  // ambiguous fall-back hour → NULL
      row(12L, "2024-03-10 02:30:00")) // spring-forward gap → shifted
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = CleanOps.parseTimestamps(df).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3)).map(_.toString)).toMap
    assert(out(0L).contains("2024-01-15 17:00:00.0"), s"EST offset: ${out(0L)}")
    assert(out(4L).contains("2024-06-15 16:00:00.0"), s"EDT offset: ${out(4L)}")
    assert(out(8L).isEmpty, "ambiguous local time must normalize to NULL")
    assert(out(12L).contains("2024-03-10 07:30:00.0"), s"gap shift: ${out(12L)}")
  }

  test("jsonExtractProps pulls typed values") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq((1L, ts, 1L, "x", 1.0, """{"k": 42}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(CleanOps.jsonExtractProps(df).head.getInt(1) == 42)
  }

  test("geohashEncode produces 7-char NYC-box hashes") {
    val df = Seq(Tuple1(123L)).toDF("c_custkey")
    val gh = CleanOps.geohashEncode(df).head.getString(3)
    assert(gh.length == 7 && gh.startsWith("dr")) // NYC geohash prefix
  }

  test("nullProfile counts per-column nulls in one scan with exact rates") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, None, Some(2.0)),
      (3L, Some("c"), None),
      (4L, None, None))
      .toDF("id", "s", "v")
    val out = CleanOps.nullProfile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_null"), r.getAs[Long]("null_micro")))).toMap
    assert(out("id") == ((4L, 0L, 0L)))
    assert(out("s") == ((4L, 2L, 500000L)))
    assert(out("v") == ((4L, 2L, 500000L)))
  }

  test("jsonKeyProfile discovers keys, presence shares, and implied types") {
    // event_ids 0..3 hit each synthesis branch once: k in all 4 payloads,
    // device in 2 (ios/android), price in 2 (numbers with decimals)
    val events = (0L to 3L).map(i => (i, s"""{"k": $i}"""))
      .toDF("event_id", "props")
    val got = CleanOps.jsonKeyProfile(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == Set("k", "device", "price"))
    assert(got("k") == ((4L, 1000000L, 4L, "number")))
    assert(got("device") == ((2L, 500000L, 2L, "string")))
    assert(got("price") == ((2L, 500000L, 2L, "number")))
  }
}
