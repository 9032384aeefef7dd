package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Native time-travel SQL for `graftvt` tables:
  *
  *   SELECT ... FROM t VERSION AS OF 3
  *   SELECT ... FROM t TIMESTAMP AS OF 1755300000000        -- epoch ms
  *   SELECT ... FROM t TIMESTAMP AS OF '2026-08-16 12:00:00'
  *
  * Spark's own grammar already parses the `FOR? VERSION|TIMESTAMP AS OF`
  * temporal clause into [[RelationTimeTravel]]; what Spark lacks is a
  * V1-relation resolution for it (the analyzer routes time travel through
  * DSv2 `TableCatalog.loadTable(ident, version)`, which the session
  * catalog's V1 tables do not implement — the statement dies with "time
  * travel is not supported"). Rather than extend the grammar, the
  * delegating parser ([[GraftSqlParser]]) swaps each parsed
  * `RelationTimeTravel` over an unresolved relation for a
  * [[GraftTimeTravelPlaceholder]], and [[GraftVtTimeTravelRule]] (an
  * injected resolution rule) resolves the placeholder EXACTLY like the
  * existing view options: the pinned relation is
  * `spark.read.format("graftvt").options(tableParameters + versionAsOf/
  * timestampAsOf).load()` — the same [[GraftVtRelation]] the
  * `versionAsOf` option path builds, so manifest pruning, stats skipping
  * and the read-only mutation guard ([[GraftVtDml.requireMutable]]) all
  * apply to the pinned scan identically.
  *
  * Tables that are NOT graftvt fall back to Spark's native
  * [[RelationTimeTravel]] untouched, preserving stock behavior (a clear
  * "time travel is not supported" analysis error, or the DSv2 path if a
  * real DSv2 time-travel catalog is ever registered in the session).
  */
private[graft] case class GraftTimeTravelPlaceholder(
    relation: UnresolvedRelation,
    timestamp: Option[Expression],
    version: Option[String]) extends LeafNode {
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false
}

private[graft] object GraftVtTimeTravel {
  /** Parser-side substitution: every RelationTimeTravel over an unresolved
    * relation becomes the graft placeholder. Runs on the PARSED (fully
    * unresolved) tree. Two traversal gaps a plain transformUp would leave:
    * expression subqueries (IN/EXISTS/scalar — their plans live inside
    * expressions, covered by transformUpWithSubqueries) and CTE legs
    * (UnresolvedWith keeps cteRelations as innerChildren, NOT children —
    * recursed into explicitly). */
  def substitute(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, s, mc) =>
          (n, substitute(s).asInstanceOf[SubqueryAlias], mc)
        })
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        GraftTimeTravelPlaceholder(u, ts, ver)
    }
}

/** Resolves [[GraftTimeTravelPlaceholder]]: graftvt targets become a
  * pinned relation (the `versionAsOf` / `timestampAsOf` option path);
  * everything else reverts to Spark's native [[RelationTimeTravel]]. */
final class GraftVtTimeTravelRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case p: GraftTimeTravelPlaceholder => resolvePlaceholder(p)
    }

  private def resolvePlaceholder(p: GraftTimeTravelPlaceholder)
      : LogicalPlan = {
    val name = p.relation.multipartIdentifier.mkString(".")
    // the target resolves through the session catalog like any read; a
    // missing table, or a non-graftvt one, reverts to Spark's own node so
    // the stock error (or a real DSv2 path) is what the user sees
    val target =
      try Some(spark.table(name).queryExecution.analyzed)
      catch { case _: Exception => None }
    target.flatMap(GraftVtDml.targetOf) match {
      case Some((_, rel)) =>
        val pin: (String, String) = (p.version, p.timestamp) match {
          case (Some(v), _) =>
            val n = v.trim
            if (!n.matches("\\d+"))
              throw new UnsupportedOperationException(
                s"graftvt VERSION AS OF: version must be a non-negative " +
                s"integer, got '$v'")
            ("versionAsOf", n)
          case (_, Some(ts)) => ("timestampAsOf", toEpochMs(ts).toString)
          case _ => throw new IllegalStateException(
            "RelationTimeTravel with neither version nor timestamp")
        }
        // pinned views must not inherit a conflicting pin from the table
        // definition itself (a table registered WITH versionAsOf is already
        // a view; re-pinning it is the relation's own error to raise)
        val opts = rel.tableParameters + pin
        spark.read.format("graftvt").options(opts).load()
          .queryExecution.analyzed
      case None =>
        RelationTimeTravel(p.relation, p.timestamp, p.version)
    }
  }

  /** `TIMESTAMP AS OF <expr>`: an integer literal is epoch-ms (the same
    * convention as the `timestampAsOf` option and `RESTORE ... TO
    * TIMESTAMP AS OF`); any other literal casts through TimestampType in
    * the session zone (micros → ms). Non-literals are rejected — the pin
    * must be decidable at analysis time, exactly like the option. */
  private def toEpochMs(e: Expression): Long = {
    if (!e.foldable)
      throw new UnsupportedOperationException(
        "graftvt TIMESTAMP AS OF: the timestamp must be a literal " +
        s"(epoch-ms integer or timestamp string), got ${e.sql}")
    e.dataType match {
      case LongType | IntegerType => e.eval().toString.toLong
      case _ =>
        val zone = spark.sessionState.conf.sessionLocalTimeZone
        // an ANSI session's cast THROWS on malformed input rather than
        // returning null — either way, surface the same clear message
        val v =
          try Cast(e, TimestampType, Some(zone)).eval()
          catch { case _: Exception => null }
        if (v == null)
          throw new UnsupportedOperationException(
            s"graftvt TIMESTAMP AS OF: ${e.sql} does not parse as a " +
            "timestamp")
        v.asInstanceOf[Long] / 1000L
    }
  }
}
