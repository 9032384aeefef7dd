package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoinRewrite: the keyless band join `abs(x − y) <= c` must (a) keep
  * its exact semantics — proven against the unrewritten nested-loop plan,
  * including negatives around the truncating-division zero cell — and
  * (b) actually plan as an equi join (Exchange + hash/sort-merge), not a
  * BroadcastNestedLoopJoin. */
class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  graft.plans.RangeJoinRewrite.install(spark)

  private def bandJoin(xs: Seq[Long], c: Long) = {
    val a = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("a_id", "a_v")
    val b = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("b_id", "b_v")
    a.join(b, abs($"a_v" - $"b_v") <= lit(c) && $"a_id" < $"b_id")
      .select($"a_id", $"b_id")
  }

  test("rewritten plan is an equi join with a Generate, not a nested loop") {
    val p = bandJoin((1L to 50L).map(_ * 3), 7L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("Generate"), p.take(800))
  }

  test("band join results equal the nested-loop plan, negatives included") {
    // values straddle zero so the truncating-div cells around 0 are hit
    val xs = Seq(-23L, -17L, -10L, -9L, -5L, -1L, 0L, 1L, 4L, 8L, 9L, 15L, 22L)
    for (c <- Seq(1L, 3L, 5L, 10L)) {
      val auto = bandJoin(xs, c).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = spark.conf.get("spark.graft.rangeJoin", "true") match {
        case _ =>
          spark.conf.set("spark.graft.rangeJoin", "false")
          try bandJoin(xs, c).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          finally spark.conf.set("spark.graft.rangeJoin", "true")
      }
      assert(auto == naive, s"c=$c: rewrite changed the answer")
      // and the expected pair count from first principles
      val expect = (for {
        i <- xs.indices; j <- xs.indices
        if i < j && math.abs(xs(i) - xs(j)) <= c
      } yield (i.toLong, j.toLong)).toSet
      assert(auto == expect, s"c=$c: wrong pairs")
    }
  }

  test("disabled by conf, the naive plan comes back") {
    spark.conf.set("spark.graft.rangeJoin", "false")
    try {
      val p = bandJoin((1L to 20L), 2L).queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
        p.take(800))
    } finally spark.conf.set("spark.graft.rangeJoin", "true")
  }

  test("a join that already has an equi key is left alone") {
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "a_v")
    val b = Seq((1L, 12L), (2L, 99L)).toDF("k2", "b_v")
    val j = a.join(b, $"k" === $"k2" && abs($"a_v" - $"b_v") <= lit(5L))
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), p.take(800))
    assert(j.collect().length == 1)
  }

  test("BETWEEN spelling rewrites too, including asymmetric bounds") {
    val xs = Seq(-9L, -4L, 0L, 3L, 5L, 11L, 20L, 21L)
    val a = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("a_id", "a_v")
    val b = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("b_id", "b_v")
    // a_v BETWEEN b_v - 3 AND b_v + 7 (asymmetric band)
    val j = a.join(b,
      $"a_v" >= $"b_v" - lit(3L) && $"a_v" <= $"b_v" + lit(7L) &&
        $"a_id" =!= $"b_id")
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && p.contains("Generate"),
      p.take(800))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val expect = (for {
      i <- xs.indices; k <- xs.indices
      if i != k && xs(i) >= xs(k) - 3 && xs(i) <= xs(k) + 7
    } yield (i.toLong, k.toLong)).toSet
    assert(got == expect)
  }

  test("extreme values near Long.Min/Max do not overflow the cell arithmetic") {
    // cell(Long.MinValue) − 1 and cell(Long.MaxValue) + 1 wrap; with ANSI
    // arithmetic the rewrite would THROW where the naive plan returns rows.
    // Wrapped cell ids are safe: the residual predicate re-checks every
    // candidate pair exactly, so a wrapped id can only create a filtered
    // spurious candidate, never a wrong match.
    val xs = Seq(Long.MinValue, Long.MinValue + 1, -5L, 0L, 7L,
      Long.MaxValue - 1, Long.MaxValue)
    for (c <- Seq(1L, 3L)) {
      val got = bandJoin(xs, c).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        i <- xs.indices; j <- xs.indices
        // BigInt avoids overflow in the reference difference
        if i < j && (BigInt(xs(i)) - BigInt(xs(j))).abs <= c
      } yield (i.toLong, j.toLong)).toSet
      assert(got == expect, s"c=$c")
    }
  }

  test("variable-width interval join rewrites: point side one cell, interval side spans") {
    val pts = Seq(0L, 5L, 17L, 99L, 150L, 1000L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("p_id", "t")
    // intervals of very different widths, plus inverted and null bounds
    val iv = Seq(
      (100L, Some(0L), Some(20L)),      // covers 0,5,17
      (101L, Some(90L), Some(2000L)),   // wide: covers 99,150,1000
      (102L, Some(60L), Some(40L)),     // inverted: matches nothing
      (103L, None, Some(10L)),          // null bound: matches nothing
      (104L, Some(149L), Some(151L))    // narrow: covers 150
    ).toDF("i_id", "lo", "hi")
    spark.conf.set("spark.graft.rangeJoin.intervalCellWidth", "64")
    try {
      val j = pts.join(iv, $"t" >= $"lo" && $"t" <= $"hi")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && p.contains("Generate"),
        p.take(800))
      val got = j.select($"p_id", $"i_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq((0L, 100L), (1L, 100L), (2L, 100L), (3L, 101L),
        (4L, 101L), (4L, 104L), (5L, 101L)))
    } finally spark.conf.unset("spark.graft.rangeJoin.intervalCellWidth")
  }

  test("registered query join_range_auto matches the manual bucket version") {
    val auto = SparkEntry.queries("join_range_auto")(spark, TestSpark.sfDir)
    val manual = SparkEntry.queries("join_range_bucket")(spark, TestSpark.sfDir)
    assert(auto.exceptAll(manual).isEmpty && manual.exceptAll(auto).isEmpty)
    val p = auto.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }
}
