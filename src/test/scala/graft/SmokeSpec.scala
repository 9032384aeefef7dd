package graft

import org.scalatest.funsuite.AnyFunSuite

class SmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("representative queries return rows on sf0.001") {
    val expectNonEmpty = Seq("agg_q1_pricing", "join_inner_equi", "win_rank",
      "etl_schedule_expand", "text_wordcount", "sim_cosine_topk",
      "stream_tumbling", "dedup_minhash_pairs")
    expectNonEmpty.foreach { name =>
      assert(SparkEntry.queries(name)(spark, TestSpark.sfDir).count() > 0, name)
    }
  }

  test("query column names match oracle aliases (spot check)") {
    val df = SparkEntry.queries("agg_q1_pricing")(spark, TestSpark.sfDir)
    assert(df.columns.toSet == Set("l_returnflag", "l_linestatus", "sum_qty_e6",
      "sum_base_price_e6", "sum_disc_price_e6", "sum_charge_e6", "count_order"))
  }
}
