package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

private[graft] object OpUtils {
  /** Spread a (possibly single-split) input across all cores before a
    * CPU-dense per-row stage — on a cluster, upstream files usually give
    * enough splits, but a scan with fewer splits than cores would
    * otherwise serialize the hashing work on one task.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact quantile bucketing via the distinct-value CDF — the
    * scale-safe substitute for a global ntile (which would
    * single-partition-sort every ROW): group rows by value, cumulative-
    * sum counts over the DISTINCT-value table only, and assign
    * bucket = ⌊(first_rank−1)·k / N⌋ + 1, so a tie group lands wholly in
    * its first member's bucket (deterministic without a per-row total
    * order). Returns the distinct-value table (valueCol, n, bucket).
    * Callers must quantize continuous domains first (floor to
    * dollars/micro-units) or the distinct table is corpus-sized.
    * Shared by perplexity_buckets and order_value_deciles — one
    * definition of the quantile semantics, not two.
    */
  def cdfBuckets(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    val byV = df.groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("nd"))
    byV.crossJoin(broadcast(total))
      .withColumn("cum_n", sum(col("n")).over(
        Window.orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bucket", expr(s"((cum_n - n) * $buckets) div nd + 1"))
      .select(col(valueCol), col("n"), col("bucket"))
  }
}
