package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the star-schema testdata (TPC-H-ish + events/documents/
  * embeddings). One parquet file per table under the scale-factor dir.
  *
  * Operators take DataFrames, not paths, so the same code runs on a real
  * warehouse catalog; these helpers are the local parquet binding. Column
  * pruning and predicate pushdown happen in the operator's first
  * select/filter (visible as ReadSchema/PushedFilters in .explain).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    fixNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** A foreign session (the driver's smoke check) reads the testdata's
    * timezone-naive timestamp[us] columns (events.ts, o_orderdate,
    * l_shipdate) as TIMESTAMP_NTZ, which breaks epoch casts downstream;
    * our own sessions set spark.sql.parquet.inferTimestampNTZ.enabled=
    * false so this rewrite never fires for Verify/Bench (keeping scans
    * cast-free and pushdown-friendly).
    *
    * The stored wall-clock values MEAN UTC (that is what the DuckDB
    * oracle reads), but a bare NTZ→LTZ cast interprets them in the
    * SESSION zone — correct only for UTC-pinned GraftSession sessions.
    * For a foreign session in any other zone, the cast is compensated
    * with from_utc_timestamp(·, sessionZone): cast subtracts the
    * session-zone offset, from_utc_timestamp adds it back, so the epoch
    * equals the wall clock read as UTC in EVERY session zone. (The two
    * offsets are looked up microseconds apart, so a value falling
    * exactly inside a DST transition hour of an exotic session zone
    * could still shift — the synthetic data carries no such instants.)
    */
  private def fixNtz(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
    if (ntz.isEmpty) df
    else {
      val zone = df.sparkSession.sessionState.conf.sessionLocalTimeZone
      ntz.foldLeft(df)((d, f) => d.withColumn(f.name,
        org.apache.spark.sql.functions.from_utc_timestamp(
          org.apache.spark.sql.functions.col(f.name)
            .cast(org.apache.spark.sql.types.TimestampType), zone)))
    }
  }

  /** Normalize the events `ts` column to plain TimestampType regardless
    * of how the parquet writer encoded it. Seen across testdata
    * generations: TIMESTAMP(NANOS) (readable only as long via
    * spark.sql.legacy.parquet.nanosAsLong, set in GraftSession) and
    * timezone-naive timestamp[us] (Spark 4 infers TIMESTAMP_NTZ unless
    * spark.sql.parquet.inferTimestampNTZ.enabled=false — set in
    * GraftSession, but a foreign session such as the driver's smoke
    * check may not have it). With the session time zone pinned to UTC
    * the NTZ→LTZ cast preserves the stored microsecond values, which is
    * exactly what the DuckDB oracle reads.
    */
  private def fixTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }).getOrElse(df)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = fixTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
