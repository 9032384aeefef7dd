package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.PlanShim

/** Whole-operator Catalyst extension: top-k rows per group as a custom
  * LogicalPlan + SparkStrategy + two-phase physical operator.
  *
  * Why the built-ins genuinely can't express this shape: the standard
  * `row_number() OVER (PARTITION BY g ORDER BY s) <= k` plan must shuffle
  * EVERY row of every group and fully sort each partition before the
  * filter drops all but k — at 100 TB the shuffle carries the whole table.
  * This operator keeps a bounded k-element heap per group inside each map
  * task (the `TakeOrderedAndProject` idea, generalized per group), so the
  * shuffle carries at most k·|groups| rows per map partition, then an
  * identical merge pass after a hash exchange produces the exact per-group
  * top-k. Partial(union of per-partition top-k) ⊇ global top-k per group,
  * so the two-phase split is lossless — the same algebra as partial
  * aggregation.
  *
  * EnsureRequirements inserts the hash exchange between the two phases
  * from `requiredChildDistribution` — the operator itself never schedules
  * a shuffle.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val g = groupExprs
    val so = order
    val kk = k
    val out = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(g, out)
      val ord = new LazilyGeneratedOrdering(so, out)
      // max-heap on the sort order: peek() is the WORST row currently kept,
      // i.e. the current kth — O(log k) replace, O(k·|groups|) memory.
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          new java.util.PriorityQueue[InternalRow](kk, ord.reverse))
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator().asScala)
    }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Top-k rows of `df` per `groupCols`, ordered by `sortCols`
    * ((name, ascending) pairs — give a unique tie-break key for a
    * deterministic row set). Registers the planner strategy on the
    * session idempotently. */
  def apply(df: DataFrame, groupCols: Seq[String],
            sortCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    PlanShim.addStrategy(spark, TopKPerGroupStrategy)
    val child = PlanShim.analyzed(df)
    def attr(name: String): Attribute = child.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val order = sortCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending) }
    PlanShim.ofRows(spark, TopKPerGroupNode(groupCols.map(attr), order, k, child))
  }
}
