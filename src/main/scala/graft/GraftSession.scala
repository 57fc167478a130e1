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

  /** Base-table names in the lake layout [[Tables]] reads. */
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Make the whole operator surface SQL-callable — the reference's
    * notebook UX (the Analysis notebooks run plain SQL against catalog
    * tables). Registers every base table as a temp view under its own
    * name and every graded operator as a temp view `graft_<name>`, so
    * after one call a user writes nothing but SQL:
    *
    * {{{
    * GraftSession.registerViews(spark, "/data/lake")
    * spark.sql("SELECT * FROM graft_agg_region_pct")
    * spark.sql("SELECT * FROM graft_dedup_minhash_lsh WHERE cnt > 1")
    * }}}
    *
    * Views are LAZY logical plans: registration builds each operator's
    * DataFrame (plan-only, no jobs run) and leaves optimization to
    * Catalyst at query time — filters a user writes OVER a graft view
    * participate in pushdown/pruning like any subquery, so the SQL
    * surface costs nothing over the Scala API. Operators composed over
    * other operators re-derive through the session [[operators.Memo]]
    * exactly as the API path does.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    register(spark)
    // via the typed accessors, not raw table(): events needs the
    // nanos/NTZ timestamp repair to read identically to the API path
    val base: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("region" -> Tables.region, "nation" -> Tables.nation,
        "customer" -> Tables.customer, "supplier" -> Tables.supplier,
        "part" -> Tables.part, "orders" -> Tables.orders,
        "lineitem" -> Tables.lineitem, "events" -> Tables.events,
        "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    TableNames.foreach(n => base(n)(spark, dir).createOrReplaceTempView(n))
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
  }
}
