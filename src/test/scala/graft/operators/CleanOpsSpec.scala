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

  test("parseTimestamps round-trips all three formats") {
    val ts = Timestamp.valueOf("2024-03-05 14:15:16")
    val df = Seq((0L, ts, 1L, "x", 1.0, "{}"), (1L, ts, 1L, "x", 1.0, "{}"),
      (2L, ts, 1L, "x", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = CleanOps.parseTimestamps(df).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getTimestamp(2) == ts))
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
}
