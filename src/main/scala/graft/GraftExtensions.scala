package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Catalyst extension entry point (`spark.sql.extensions=graft.GraftExtensions`,
  * set by [[GraftSession.configure]]): injects graft's optimizer rules.
  * Function registration is separate ([[GraftSession.register]]) because
  * the driver builds sessions without extensions — rules are an
  * optimization layer, never a correctness dependency.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => graft.plans.GeohashPrefixPushdown())
    // physical as-of join ([[graft.plans.AsOfJoinPlan]]); also ensured at
    // first API use via GraftPlanBridge.ensureStrategy for sessions
    // built without extensions
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
