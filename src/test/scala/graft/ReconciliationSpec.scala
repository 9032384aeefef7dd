package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator reconciliation invariants (SURVEY §5.3): independent
  * computation paths must agree — a disagreement means an operator is
  * silently wrong even if its oracle hasn't caught it. */
class ReconciliationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val d = TestSpark.sfDir

  test("running sum's final row equals the groupBy total per customer") {
    val lastRunning = SparkEntry.queries("win_running_sum")(spark, d)
      .groupBy($"o_custkey").agg(max($"running_rev_e6").as("final_run"))
    val totals = Tables.orders(spark, d)
      .groupBy($"o_custkey")
      .agg(Tables.e6(sum(Tables.dec($"o_totalprice")).cast("decimal(18,6)")).as("total"))
    val mismatches = lastRunning.join(totals, "o_custkey")
      .filter($"final_run" =!= $"total").count()
    assert(mismatches == 0)
  }

  test("union-all cardinality = sum of slice cardinalities") {
    val c = Tables.customer(spark, d)
    val a = c.filter($"c_acctbal" > 5000.0)
    val b = c.filter($"c_mktsegment" === "BUILDING")
    assert(SparkEntry.queries("set_union_all")(spark, d).count() ==
      a.count() + b.count())
  }

  test("intersect + except partition the distinct key set") {
    // same A/B on both sides (the registered queries use different A filters)
    val a = Tables.customer(spark, d).select($"c_custkey")
    val b = Tables.orders(spark, d).select($"o_custkey".as("c_custkey"))
    assert(a.intersect(b).count() + a.except(b).count() ==
      a.distinct().count())
  }

  test("semi + anti join cardinalities partition the customer set") {
    val semi = SparkEntry.queries("join_left_semi")(spark, d).count()
    val anti = SparkEntry.queries("join_left_anti")(spark, d).count()
    assert(semi + anti == Tables.customer(spark, d).count())
  }

  test("grouping-sets subtotals reconcile with their detail rows") {
    val gs = SparkEntry.queries("agg_grouping_sets")(spark, d).cache()
    val detail = gs.filter($"priority" =!= "ALL")
      .groupBy($"status").agg(sum($"n").as("n_detail"))
    val subtotal = gs.filter($"priority" === "ALL")
      .select($"status", $"n".as("n_sub"))
    val bad = detail.join(subtotal, "status")
      .filter($"n_detail" =!= $"n_sub").count()
    assert(bad == 0)
  }

  test("schedule expansion row count equals the closed-form bit count") {
    val got = SparkEntry.queries("etl_schedule_expand")(spark, d).count()
    // independent recomputation: per order, count set bits over the 14-day
    // window directly in SQL (no explode)
    val expected = Tables.orders(spark, d)
      .select($"o_orderkey", ($"o_orderkey" % 127 + 1).as("m"),
        $"o_orderdate".cast("date").as("d0"))
      .select(expr(
        """aggregate(sequence(0, 13),
          |  0L, (acc, i) -> acc +
          |    CASE WHEN shiftright(m, (dayofweek(date_add(d0, i)) + 5) % 7) % 2 = 1
          |         THEN 1L ELSE 0L END)""".stripMargin).as("cnt"))
      .agg(sum($"cnt")).as[Long].head()
    assert(got == expected)
  }
}
