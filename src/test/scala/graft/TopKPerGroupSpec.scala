package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator Catalyst extension (LogicalPlan → Strategy →
  * two-phase SparkPlan): plan shape, equivalence with the window form,
  * and edge behavior. The shape/metrics tests pin AQE off so the plan tree
  * is directly traversable; the equivalence test runs under AQE (default
  * on) proving the operator composes with adaptive execution. */
class TopKPerGroupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("plans as partial + final with a hash exchange between") { withoutAqe {
    val base = Tables.customer(spark, TestSpark.sfDir)
      .select($"c_nationkey", $"c_custkey")
    val df = TopKPerGroup(base, Seq("c_nationkey"), Seq(("c_custkey", true)), 2)
    df.collect()
    val phases = df.queryExecution.executedPlan.collect {
      case t: graft.plans.TopKPerGroupExec => t.partial }
    assert(phases == Seq(false, true),
      s"expected final-over-partial:\n${df.queryExecution.executedPlan}")
    val plan = df.queryExecution.executedPlan.toString
    val finalIdx = plan.indexOf("2, false")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("2, true")
    assert(finalIdx >= 0 && finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"exchange must sit between final (above) and partial (below):\n$plan")
  } }

  test("row set identical to the window row_number form, with tie-break") {
    val base = Tables.customer(spark, TestSpark.sfDir)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal")
    val custom = TopKPerGroup(base, Seq("c_nationkey"),
        Seq(("c_acctbal", false), ("c_custkey", true)), 3)
      .select($"c_nationkey", $"c_custkey")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val window = base.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select($"c_nationkey", $"c_custkey")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(custom == window)
  }

  test("k larger than every group returns all rows; empty input returns none") {
    val tiny = Seq((1, 10L), (1, 11L), (2, 20L)).toDF("g", "v")
    assert(TopKPerGroup(tiny, Seq("g"), Seq(("v", true)), 99).count() == 3)
    assert(TopKPerGroup(tiny.filter($"g" > 100), Seq("g"),
      Seq(("v", true)), 3).count() == 0)
  }

  test("shuffle carries only the partial survivors, not the full table") {
    withoutAqe {
      // 10k rows in ONE group, k=2: the window form shuffles all 10k; the
      // custom operator's exchange moves ≤ k rows per map partition.
      val big = spark.range(10000).select(lit(0).as("g"), $"id".as("v"))
      val df = TopKPerGroup(big, Seq("g"), Seq(("v", false)), 2)
      assert(df.collect().map(_.getLong(1)).sorted.toSeq == Seq(9998L, 9999L))
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      val m = exchanges.head.metrics
      val moved = m.getOrElse("shuffleRecordsWritten",
        m(m.keys.find(_.toLowerCase.contains("records")).get)).value
      assert(moved <= 2L * spark.sparkContext.defaultParallelism,
        s"shuffle moved $moved rows — partial top-k did not prune")
    }
  }
}
