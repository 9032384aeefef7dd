package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: keyless band join → cell-replicated equi-join.
  *
  * A join whose only cross-side predicate is a band `abs(x − y) <= c`
  * (x from the left, y from the right, c a positive integral literal) has
  * no equi key, so Spark plans it as BroadcastNestedLoopJoin / cartesian —
  * O(|L|·|R|) comparisons, the classic scale killer for event-proximity
  * and sensor-alignment queries. But the band admits an exact equi
  * reduction: bucket the domain into width-`c` cells, replicate the LEFT
  * row to its cell and both neighbors, keep the RIGHT row in its single
  * cell, equi-join on the cell id, and re-apply the original predicate as
  * the residual. Every qualifying pair lands in exactly one (replica,
  * cell) combination, so no dedup is needed; the join becomes a shuffle
  * on the cell id whose per-cell population is bounded by row rate × c.
  *
  * Coverage proof (truncating division): any pair with |x − y| ≤ c spans
  * at most one cell boundary — every `div c` cell holds ≥ c consecutive
  * integers (the cell around zero holds 2c−1), and an interval of c+1
  * integers cannot fully contain an interior cell — so cell(x) and
  * cell(y) differ by at most 1 and the 3-cell replica set always covers.
  * This holds for negative values too, which is why plain `div`
  * (truncation toward zero) needs no floor adjustment.
  *
  * The rewrite is semantics-preserving (the residual keeps the exact
  * predicate), fires only when: the join is INNER, the condition has NO
  * cross-side equi conjunct (if one exists the hash join on it is already
  * the right plan and the band is a cheap residual), and the band sides
  * are integral. Both band spellings match: `abs(x − y) <= c` and the
  * BETWEEN form `x >= y − c1 AND x <= y + c2` (cell width max(c1,c2) — a
  * superset cover the residual tightens). The rewritten join contains a
  * bucket-equality conjunct, which disqualifies it from re-matching — the
  * rule is fixed-point safe.
  *
  * Injected via [[GraftExtensions]] at session construction, or
  * retrofitted onto an existing session with [[RangeJoinRewrite.install]]
  * (`spark.experimental.extraOptimizations`). Disable with
  * `spark.graft.rangeJoin=false`.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin", "true") == "true"

  /** Positive integral literal, as Long. */
  private object PosIntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Short, ShortType) if v > 0  => Some(v.toLong)
      case Literal(v: Int, IntegerType) if v > 0  => Some(v.toLong)
      case Literal(v: Long, LongType) if v > 0    => Some(v)
      case _                                      => None
    }
  }

  /** abs(x − y) {<=,<} c, either operand order around the comparison. */
  private object Band {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), PosIntegralLit(c)) =>
        Some((x, y, c))
      case LessThan(Abs(Subtract(x, y, _), _), PosIntegralLit(c)) if c > 1 =>
        Some((x, y, c))
      case GreaterThanOrEqual(PosIntegralLit(c), Abs(Subtract(x, y, _), _)) =>
        Some((x, y, c))
      case GreaterThan(PosIntegralLit(c), Abs(Subtract(x, y, _), _)) if c > 1 =>
        Some((x, y, c))
      case _ => None
    }
  }

  /** One side of the BETWEEN spelling: x ≥ y − c (lower) / x ≤ y + c
    * (upper), any operand order. Returns (x, y, c, isLower). */
  private object HalfBand {
    def unapply(e: Expression): Option[(Expression, Expression, Long, Boolean)] =
      e match {
        case GreaterThanOrEqual(x, Subtract(y, PosIntegralLit(c), _)) =>
          Some((x, y, c, true))
        case LessThanOrEqual(Subtract(y, PosIntegralLit(c), _), x) =>
          Some((x, y, c, true))
        case LessThanOrEqual(x, Add(y, PosIntegralLit(c), _)) =>
          Some((x, y, c, false))
        case GreaterThanOrEqual(Add(y, PosIntegralLit(c), _), x) =>
          Some((x, y, c, false))
        case _ => None
      }
  }

  /** Point-in-interval: x ≥ lo AND x ≤ hi where lo/hi are arbitrary
    * expressions of the OTHER side (variable-width intervals — no
    * constant to bucket by). Returns (x, lo, hi). The rewrite replicates
    * the interval side to EVERY width-W cell the interval touches
    * (explode(sequence(lo div W, hi div W))) and the point side to its
    * single cell, so coverage holds for ANY interval width — W (conf
    * `spark.graft.rangeJoin.intervalCellWidth`) only tunes the
    * replication factor, never correctness. A point in [lo, hi] has
    * cell(x) ∈ [cell(lo), cell(hi)] by monotonicity, and each (point,
    * interval) pair meets in exactly one cell (the point's). */
  private def intervalBand(conjuncts: Seq[Expression],
                           leftSet: AttributeSet, rightSet: AttributeSet)
      : Option[(Expression, Expression, Expression)] = {
    def sameSide(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(leftSet) && b.references.subsetOf(leftSet)) ||
      (a.references.subsetOf(rightSet) && b.references.subsetOf(rightSet))
    def opposite(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(leftSet) && b.references.subsetOf(rightSet)) ||
      (a.references.subsetOf(rightSet) && b.references.subsetOf(leftSet))
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(x, lo) => (x, lo)
      case LessThanOrEqual(lo, x)    => (x, lo)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(x, hi)    => (x, hi)
      case GreaterThanOrEqual(hi, x) => (x, hi)
    }
    (for {
      (x, lo) <- lowers
      (x2, hi) <- uppers
      if x.semanticEquals(x2) && x.deterministic &&
        lo.deterministic && hi.deterministic &&
        integral(x) && integral(lo) && integral(hi) &&
        lo.references.nonEmpty && hi.references.nonEmpty &&
        sameSide(lo, hi) && opposite(x, lo)
    } yield (x, lo, hi)).headOption
  }

  /** Find the BETWEEN band in a conjunct list: a lower and an upper half
    * over the SAME (x, y) pair. Width = max(c1, c2) — a superset cover
    * (y−c1 ≤ x ≤ y+c2 implies |x−y| ≤ max), exactness restored by the
    * residual. */
  private def betweenBand(conjuncts: Seq[Expression])
      : Option[(Expression, Expression, Long)] = {
    val halves = conjuncts.collect { case HalfBand(x, y, c, lower) =>
      (x, y, c, lower)
    }
    halves.collectFirst {
      case (x, y, c1, true) if halves.exists { case (x2, y2, _, lower2) =>
          !lower2 && x2.semanticEquals(x) && y2.semanticEquals(y) } =>
        val c2 = halves.collectFirst { case (x2, y2, cc, false)
            if x2.semanticEquals(x) && y2.semanticEquals(y) => cc }.get
        (x, y, math.max(c1, c2))
    }
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _                                  => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        // An existing cross-side equi key (= or <=>) means Spark already
        // plans a hash join — replicating 3× for the band adds no benefit,
        // so both forms disqualify the rewrite.
        def crossSide(a: Expression, b: Expression): Boolean =
          (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) &&
            a.references.subsetOf(right.outputSet))
        val crossSideEqui = conjuncts.exists {
          case EqualTo(a, b)       => crossSide(a, b)
          case EqualNullSafe(a, b) => crossSide(a, b)
          case _ => false
        }
        def orient(x: Expression, y: Expression, c: Long)
            : Option[(Expression, Expression, Long)] =
          if (!x.deterministic || !y.deterministic ||
              !integral(x) || !integral(y)) None
          else if (x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet)) Some((x, y, c))
          else if (y.references.subsetOf(left.outputSet) &&
              x.references.subsetOf(right.outputSet)) Some((y, x, c))
          else None
        if (crossSideEqui) j
        else {
          // abs(x−y)<=c first (Band is symmetric in x/y), then the
          // two-conjunct BETWEEN spelling, then variable-width intervals
          val fixedBand =
            conjuncts.collectFirst { case Band(x, y, c) => (x, y, c) }
              .orElse(betweenBand(conjuncts))
              .flatMap { case (x, y, c) => orient(x, y, c) }
          fixedBand match {
            case Some((lx, rx, c)) => rewrite(j, lx, rx, c)
            case None =>
              intervalBand(conjuncts, left.outputSet, right.outputSet) match {
                case Some((x, lo, hi)) => rewriteInterval(j, x, lo, hi)
                case None              => j
              }
          }
        }
    }

  private def rewrite(j: Join, lx: Expression, rx: Expression,
                      c: Long): LogicalPlan = {
    val width = Literal(c, LongType)
    val one = Literal(1L, LongType)
    val cellL = IntegralDivide(Cast(lx, LongType), width)
    val cellR = IntegralDivide(Cast(rx, LongType), width)
    // Left row → its cell and both neighbors (3 distinct ids, so a pair
    // can only ever meet once); a null band key yields null cells that
    // match nothing, mirroring the original predicate's null semantics.
    // At the int64 domain edge the neighbor cell does not exist — emit a
    // NULL replica instead of letting cell±1 overflow: NULL joins
    // nothing, so no pair is lost (there is no cell beyond the edge) and
    // no spurious far-apart candidate reaches the residual predicate
    // (whose ANSI subtraction would throw on it). RangeJoinSpec pins
    // Long.Min/Long.Max behavior.
    val nullCell = Literal(null, LongType)
    def guarded(edge: Long, step: Expression => Expression): Expression =
      If(EqualTo(cellL, Literal(edge, LongType)), nullCell, step(cellL))
    val cells = CreateArray(Seq(
      guarded(Long.MinValue, c => Subtract(c, one, EvalMode.LEGACY)),
      cellL,
      guarded(Long.MaxValue, c => Add(c, one, EvalMode.LEGACY))))
    val bucketL = AttributeReference("__graft_cell", LongType)()
    val gen = Generate(Explode(cells), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(bucketL),
      child = j.left)
    val bucketR = Alias(cellR, "__graft_cell_r")()
    val projR = Project(j.right.output :+ bucketR, j.right)
    val newCond = And(EqualTo(bucketL, bucketR.toAttribute), j.condition.get)
    // Restore the original output (drop the cell columns).
    Project(j.left.output ++ j.right.output,
      Join(gen, projR, Inner, Some(newCond), j.hint))
  }

  /** Variable-width point-in-interval: the INTERVAL side replicates to
    * every width-W cell its [lo, hi] touches (explode of the cell
    * sequence — step auto-selected so an inverted interval yields
    * harmless extra replicas instead of an error, and a NULL bound emits
    * no rows, matching inner-join null semantics); the POINT side keeps
    * its single cell. Each overlapping pair meets exactly once, in the
    * point's cell. W only tunes replication (default 2^32 ticks). */
  private def rewriteInterval(j: Join, x: Expression, lo: Expression,
                              hi: Expression): LogicalPlan = {
    // A bad conf value must not explode inside the optimizer, and a tiny
    // width with wide intervals would build huge (or >2^31, runtime-error)
    // replica arrays — clamp unparsable/non-positive values to the default.
    val defaultW = 4294967296L
    val wVal = scala.util.Try(conf.getConfString(
        "spark.graft.rangeJoin.intervalCellWidth", defaultW.toString).toLong)
      .toOption.filter(_ > 0L).getOrElse(defaultW)
    val w = Literal(wVal, LongType)
    val xOnLeft = x.references.subsetOf(j.left.outputSet)
    val pointChild = if (xOnLeft) j.left else j.right
    val intervalChild = if (xOnLeft) j.right else j.left
    val cellX = Alias(IntegralDivide(Cast(x, LongType), w), "__graft_pcell")()
    val pointProj = Project(pointChild.output :+ cellX, pointChild)
    // Sequence is TimeZoneAwareExpression — unresolved without a zone id
    // even over integral inputs
    val cells = Sequence(
      IntegralDivide(Cast(lo, LongType), w),
      IntegralDivide(Cast(hi, LongType), w), None,
      Some(conf.sessionLocalTimeZone))
    val bucketI = AttributeReference("__graft_icell", LongType)()
    val gen = Generate(Explode(cells), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(bucketI),
      child = intervalChild)
    val newLeft = if (xOnLeft) pointProj else gen
    val newRight = if (xOnLeft) gen else pointProj
    val newCond = And(EqualTo(cellX.toAttribute, bucketI), j.condition.get)
    Project(j.left.output ++ j.right.output,
      Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}

object RangeJoinRewrite {
  /** Idempotently retrofit the rule onto an already-built session. */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RangeJoinRewrite]))
      spark.experimental.extraOptimizations = cur :+ RangeJoinRewrite()
  }
}
