package graft.plans

import scala.collection.mutable

/** Deterministic dependency-graph runner for the batch warehouse path —
  * the orchestration layer the reference drives with Airflow
  * (`src/311 /nyc_ingestion_dag.py:130-172`: PythonOperator tasks, `>>`
  * dependency edges, `retries: 1` in default_args). The streaming side
  * of that cadence is already mirrored as foreachBatch maintenance
  * loops; this is the batch complement: run dims before facts, retry
  * transient failures, fail-fast the dependents of a dead job while
  * unrelated branches keep going (Airflow's upstream_failed → skipped
  * semantics).
  *
  * Deliberately driver-side and tiny: the GRAPH is metadata (a handful
  * of nodes even for a big warehouse); all data-scale work stays inside
  * each job's Spark action. Jobs run sequentially in one deterministic
  * topological order (Kahn's algorithm, lexicographic tie-break) so two
  * runs of the same DAG execute identically — concurrency inside a job
  * belongs to Spark, not the orchestrator.
  */
object JobDag {

  /** One node: `run` performs the job's Spark action(s); `retries` is
    * how many times a THROWN run is re-attempted before the job is
    * declared failed (the reference's `retries: 1`).
    */
  final case class Job(name: String, deps: Seq[String], run: () => Unit,
      retries: Int = 1)

  sealed trait Status
  case object Succeeded extends Status
  /** Failed after exhausting retries; carries the last error. */
  final case class Failed(error: Throwable, attempts: Int) extends Status
  /** Not attempted: some transitive dependency failed. */
  final case class Skipped(failedDep: String) extends Status

  final case class Result(name: String, status: Status, order: Int)

  /** Validate + topologically order + execute. Returns one [[Result]]
    * per job in execution order. Throws on a malformed graph (unknown
    * dependency, duplicate name, cycle) — a wiring bug, not a runtime
    * failure, and it must be loud before any job runs.
    */
  def run(jobs: Seq[Job]): Seq[Result] = {
    val byName = jobs.map(j => j.name -> j).toMap
    require(byName.size == jobs.size,
      s"duplicate job names: ${jobs.groupBy(_.name).collect { case (n, js) if js.size > 1 => n }}")
    jobs.foreach(j => j.deps.foreach(d => require(byName.contains(d),
      s"job '${j.name}' depends on unknown job '$d'")))

    // Kahn's algorithm; ready set kept sorted for determinism
    val indeg = mutable.Map(jobs.map(j => j.name -> j.deps.size): _*)
    val dependents = jobs.flatMap(j => j.deps.map(_ -> j.name))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val ready = mutable.SortedSet(indeg.collect {
      case (n, 0) => n
    }.toSeq: _*)
    val order = mutable.ArrayBuffer[String]()
    while (ready.nonEmpty) {
      val n = ready.head
      ready -= n
      order += n
      dependents.getOrElse(n, Nil).foreach { d =>
        indeg(d) -= 1
        if (indeg(d) == 0) ready += d
      }
    }
    require(order.size == jobs.size,
      s"dependency cycle among: ${indeg.collect { case (n, d) if d > 0 => n }}")

    val status = mutable.Map[String, Status]()
    order.zipWithIndex.map { case (name, idx) =>
      val job = byName(name)
      val blocked = job.deps.find(d => status(d) match {
        case Succeeded => false
        case _ => true
      })
      val st = blocked match {
        case Some(dep) =>
          // transitive: if the dep itself was skipped, surface the ROOT
          // failure so every skip names the job that actually died
          val root = status(dep) match {
            case Skipped(r) => r
            case _ => dep
          }
          Skipped(root)
        case None =>
          var attempt = 0
          var outcome: Option[Throwable] = Some(new IllegalStateException("unrun"))
          while (outcome.isDefined && attempt <= job.retries) {
            attempt += 1
            outcome = try { job.run(); None } catch { case e: Throwable => Some(e) }
          }
          outcome.map(Failed(_, attempt)).getOrElse(Succeeded)
      }
      status(name) = st
      Result(name, st, idx)
    }.toSeq
  }

  /** The full warehouse build wired as a DAG over the star-schema
    * operators: conformed dims first, facts only after every dim they
    * reference, the FK audit only after both facts — the dependency
    * edges a production run of SURVEY §2.B needs. Each job materializes
    * through `action` (tests count; production writes a sink).
    */
  def warehouseBuild(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      action: org.apache.spark.sql.DataFrame => Unit): Seq[Job] = {
    import graft.operators.{AuditOps, StarSchema}
    val t = graft.Tables
    def job(name: String, deps: Seq[String])(
        df: => org.apache.spark.sql.DataFrame) =
      Job(name, deps, () => action(df))
    Seq(
      job("dim_date", Nil)(
        StarSchema.dimDate(t.orders(spark, sfDir), t.lineitem(spark, sfDir))),
      job("dim_customer_geo", Nil)(
        StarSchema.dimCustomerGeo(t.customer(spark, sfDir),
          t.nation(spark, sfDir), t.region(spark, sfDir))),
      job("dim_supplier_geo", Nil)(
        StarSchema.dimSupplierGeo(t.supplier(spark, sfDir),
          t.nation(spark, sfDir), t.region(spark, sfDir))),
      job("fact_orders", Seq("dim_date", "dim_customer_geo"))(
        StarSchema.factOrders(t.orders(spark, sfDir),
          t.customer(spark, sfDir), t.nation(spark, sfDir))),
      job("fact_lineitem", Seq("dim_date", "fact_orders"))(
        StarSchema.factLineitem(t.lineitem(spark, sfDir),
          t.orders(spark, sfDir))),
      job("fk_audit", Seq("fact_orders", "fact_lineitem",
        "dim_customer_geo", "dim_supplier_geo"))(
        AuditOps.fkOrphans(t.lineitem(spark, sfDir), t.orders(spark, sfDir),
          t.part(spark, sfDir), t.supplier(spark, sfDir),
          t.customer(spark, sfDir), t.nation(spark, sfDir),
          t.region(spark, sfDir))))
  }
}
