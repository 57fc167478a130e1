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
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS) which Spark 4 only reads as
    * long (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession /
    * Verify / Bench); convert ns → µs-truncated TimestampType here so
    * downstream operators see a normal timestamp column.
    */
  private def fixNanos(df: DataFrame): DataFrame =
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")))
      .getOrElse(df)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = fixNanos(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
