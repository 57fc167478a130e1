package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the local[32] test harness but with settings that transfer to a
  * real cluster: AQE (runtime partition coalescing + skew-join splitting),
  * explicit shuffle partition count, UTC session time zone (oracle parity).
  */
object GraftSession {

  /** Apply graft defaults + function registration to an existing builder. */
  def configure(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      // Catalyst rule injection (geohash-prefix → bounding-box pushdown)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // size-first coalescing (the production recommendation): shuffles
      // shrink to what their bytes justify instead of being held at the
      // parallelism floor — dim-sized exchanges collapse to 1-2 tasks,
      // which is most of the fixed overhead across a 170-query workload
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.parquet has varied across generations:
      // TIMESTAMP(NANOS) (read as long ns; Tables.events converts) and
      // naive timestamp[us] (read as LTZ directly instead of NTZ so the
      // scan needs no cast and ts predicates still push down)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // managed (bucketed) tables land in tmp, not the repo working dir
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")

  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    register(spark)
    spark
  }

  /** Idempotently register graft SQL functions on any session (needed when
    * the session was built without `withExtensions`, e.g. by the driver).
    */
  def register(spark: SparkSession): Unit =
    functions.GraftFunctions.registerAll(spark)
}
