package graft.operators

import org.apache.spark.sql.DataFrame

private[graft] object OpUtils {
  /** Spread a (possibly single-split) input across all cores before a
    * CPU-dense per-row stage — on a cluster, upstream files usually give
    * enough splits, but a scan with fewer splits than cores would
    * otherwise serialize the hashing work on one task.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
