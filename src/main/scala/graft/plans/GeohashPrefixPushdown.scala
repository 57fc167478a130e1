package graft.plans

import graft.functions.{GeohashEncode, GeohashExpr}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression,
  GreaterThanOrEqual, LessThanOrEqual, Literal, PredicateHelper, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: derive pushable lat/lon bounding-box predicates from
  * geohash-prefix filters.
  *
  * `filter(graft_geohash(lat, lon, 7) LIKE 'dr5%')` is exact but opaque
  * to the scan — the geohash is computed per row, so the parquet reader
  * gets NO pushed filter and a 100 TB geo query devolves to a full scan.
  * This rule recognizes `StartsWith`/`EqualTo` on a [[GeohashExpr]] over
  * a string literal and CONJOINS the prefix cell's (margin-widened,
  * provably-superset — [[GeohashEncode.prefixBounds]]) lat/lon range
  * predicates. The original geohash predicate stays — bounds PRUNE, the
  * exact predicate DECIDES — so semantics are untouched while the range
  * conjuncts push into the parquet scan (row-group/zone pruning) through
  * the normal predicate-pushdown machinery running in the same optimizer
  * batch.
  *
  * Fixed-point safe: derived conjuncts already present (semantically)
  * are not re-added, so the second pass is a no-op. Registered via
  * [[graft.GraftExtensions]] (`spark.sql.extensions=graft.GraftExtensions`
  * or `GraftSession.local`).
  */
case class GeohashPrefixPushdown() extends Rule[LogicalPlan] with PredicateHelper {

  /** Range conjuncts implied by one geohash-prefix predicate, if it is
    * a recognizable shape with a derivable, non-edge bounding box.
    */
  private def implied(conjunct: Expression): Seq[Expression] = {
    def bounds(g: GeohashExpr, prefix: UTF8String): Seq[Expression] = {
      // the derived range conjuncts RE-EVALUATE g.left/g.right; for a
      // non-deterministic lat/lon expression the duplicate evaluations
      // could disagree with the exact predicate and drop rows it accepts
      if (!g.deterministic) return Nil
      val p = prefix.toString
      if (p.isEmpty || p.length > g.precision) return Nil
      GeohashEncode.prefixBounds(p) match {
        case None => Nil // illegal prefix chars: predicate matches nothing
        case Some((latLo, latHi, lonLo, lonHi)) =>
          def cmp(e: Expression, lo: Option[Double], hi: Option[Double]) =
            lo.map(v => GreaterThanOrEqual(e, Literal(v, DoubleType))).toSeq ++
              hi.map(v => LessThanOrEqual(e, Literal(v, DoubleType)))
          cmp(g.left, latLo, latHi) ++ cmp(g.right, lonLo, lonHi)
      }
    }
    conjunct match {
      case StartsWith(g: GeohashExpr, Literal(s: UTF8String, StringType)) =>
        bounds(g, s)
      case EqualTo(g: GeohashExpr, Literal(s: UTF8String, StringType)) =>
        bounds(g, s)
      case EqualTo(Literal(s: UTF8String, StringType), g: GeohashExpr) =>
        bounds(g, s)
      case _ => Nil
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(implied)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduceLeft(And), child)
  }
}
