package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** The MEASURED complement of PlanAuditSpec's static window sweeps: every
  * truly global window (empty partitionSpec) in any query plan or memo
  * derivation must consume a BOUNDED derivation — and "bounded" is
  * checked by executing each such window's input at sf0.1 and asserting
  * a row ceiling. The static rules prove the plan SHAPE (aggregate below
  * the window, quantized grains); this spec pins the NUMBERS, so a new
  * operator whose global window input silently scales with the corpus
  * fails here even if it slips past the shape rules.
  *
  * Ceilings by derivation class (measured at sf0.1, ~2× headroom):
  * calendar span (≤ 1 row/day), distinct quantized-value grids (dollar /
  * micro-score / bucket), literal-sized tables (resamples, lags, probe
  * ids), and the ≤1025-row two-level-CDF top. A query whose global
  * window legitimately needs more declares itself in `ceilings` with a
  * justification comment — additions without one are review flags.
  */
class BoundedWindowSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.1"

  // default = the calendar/day-grid class: the testdata order calendar
  // spans 2405 days at sf0.1 and SATURATES (a bigger SF adds orders per
  // day, not days — the full TPC-H calendar is ~2557 days), so 5000 is
  // ~2× the asymptote, not 2× a growing number
  private val DefaultCeiling = 5000L

  private val ceilings: Map[String, Long] = Map(
    // approx-quantile bracket slice: ~2·eps·n rows of the orders table
    // sit between the rank probes' lo/hi estimates (eps fixed) — a
    // corpus FRACTION by design, whitelisted in the static sweep too
    "median_order_value" -> 40000L,
    // distinct quantized order-value class: bounded by the price DOMAIN
    // (order totals quantize to ~130k distinct whole cents / dollars at
    // sf0.1; growth is toward domain saturation, not linear in rows)
    "equi_depth_histogram" -> 250000L,
    "quantile_sketch_audit" -> 250000L,
    "customer_spend_quartiles" -> 250000L,
    "order_value_percentiles_cont" -> 250000L,
    "order_value_deciles" -> 250000L,
    "ks_order_drift" -> 250000L,
    "price_outliers" -> 250000L,
    "spend_decile_lift" -> 250000L)

  test("every global window input is a bounded derivation at sf0.1 (measured)") {
    graft.operators.Memo.invalidate()
    val seen = scala.collection.mutable.Map[String, Long]()
    def inputs(name: String, plan: LogicalPlan): Seq[(String, LogicalPlan)] =
      plan.collect {
        case w: Window if w.partitionSpec.isEmpty => (name, w.child)
      }
    val queryWins = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      inputs(q, SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan)
    }
    // memo derivations hide behind checkpointed leaves in consumer
    // plans; their own optimized plans carry the real window shapes
    val memoWins = graft.operators.Memo.builtQueryExecutions.toSeq
      .sortBy(_._1).flatMap { case (m, qe) =>
        inputs(s"memo:$m", qe.optimizedPlan)
      }
    val report = (queryWins ++ memoWins).flatMap { case (name, child) =>
      val key = child.canonicalized.semanticHash() + ":" +
        child.canonicalized.toString.hashCode
      val n = seen.getOrElseUpdate(key,
        spark.sessionState.executePlan(child).executedPlan.execute().count())
      val cap = ceilings.getOrElse(name.stripPrefix("memo:"), DefaultCeiling)
      if (n > cap) Some(s"$name: global-window input $n rows > ceiling $cap")
      else None
    }
    assert(report.isEmpty,
      "unbounded global-window inputs (add a justified ceiling or " +
        "repartition the window):\n" + report.distinct.mkString("\n"))
  }
}
