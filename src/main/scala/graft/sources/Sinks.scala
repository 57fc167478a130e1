package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Warehouse-layer sinks. The reference coalesces everything to one file
  * for Redshift COPY (glue_job_clean_311.py:151-157 `coalesce(1)`) — a
  * single-writer bottleneck that cannot work at 100 TB. Here the layout
  * is partitioned parquet: writers stay parallel, and date-partitioned
  * facts get partition pruning for free on read.
  */
object Sinks {

  /** Staging layer: plain parquet, parallel writers. */
  def writeStaging(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Fact layer: parquet partitioned by the given key columns (e.g. a
    * yyyyMMdd date_key) → partition-pruned scans downstream.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Raw-layer format conversion (the reference's CSV→JSON Lambda,
    * airbnb_read.py) as a distributed job: any source DataFrame →
    * JSON-lines.
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Sort-clustered fact layout — the Spark-native answer to Redshift
    * SORTKEY: partition directories give coarse pruning; sorting rows
    * within each partition on the range key clusters values so parquet
    * row-group min/max statistics skip row groups inside each file for
    * range predicates. `sortWithinPartitions` is a local sort (no extra
    * shuffle beyond the optional repartition to control file count).
    */
  def writeSorted(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCol: String, filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(filesPerPartition, partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ sortCol).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Training-shard export: bounded-size parquet shards with a
    * deterministic, reproducible doc→shard assignment (hash mod), the
    * layout a training dataloader consumes. `maxRecordsPerFile` bounds
    * every file even when a shard key skews, so no shard exceeds what a
    * loader maps into memory; the repartition keys writers to shards so
    * shard files are whole units, not writer-task fragments.
    */
  def writeShards(df: DataFrame, path: String, idCol: String,
      shards: Int, maxRecordsPerFile: Int): Unit = {
    import org.apache.spark.sql.functions.{col, pmod, hash}
    df.withColumn("shard", pmod(hash(col(idCol)), org.apache.spark.sql.functions.lit(shards)))
      .repartition(shards, col("shard"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Bucketed catalog table: pre-shuffles once at write time so every
    * later equi-join/aggregation on the bucket key is exchange-free —
    * the Spark-native answer to Redshift DISTKEY. Joining two tables
    * bucketed the same way on the same key skips both shuffles
    * (verified in SourcesSpec by plan inspection).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
