package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Approximate-query-processing mode as a Catalyst optimizer rule: when
  * `spark.graft.approxCountDistinct=true`, every single-column
  * `count(DISTINCT x)` in an aggregation is rewritten to HyperLogLog++
  * (`approx_count_distinct`, default 5% relative sd, tunable via
  * `spark.graft.approxCountDistinct.rsd`).
  *
  * Why a logical rule and not a helper function: the rewrite then applies
  * to EVERY query in the session — SQL, DataFrame, or a downstream tool's
  * generated plan — without touching query code, which is how an engine
  * ships an opt-in "fast mode". At 100 TB the exact form shuffles every
  * distinct value (the Expand for multi-distinct multiplies the scan);
  * the HLL form shuffles one 2-4 KB sketch per group per partition, an
  * orders-of-magnitude shuffle-volume drop with a bounded error.
  *
  * Scope guards: only fires on a lone DISTINCT count with one
  * deterministic child (multi-arg distinct counts tuple equality, which
  * HLL does not model), and keeps any FILTER clause. The result column
  * type (BIGINT) is unchanged, so downstream operators are unaffected.
  */
case class ApproxDistinctRewrite() extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.approxCountDistinct", "false") == "true"

  private def rsd: Double =
    conf.getConfString("spark.graft.approxCountDistinct.rsd", "0.05").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformWithPruning(_.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.AGGREGATE)) {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(
              Count(Seq(child)), _, true, _, _) if child.deterministic =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child, rsd),
              isDistinct = false)
        }
    }
}
