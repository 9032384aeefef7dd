package graft

import java.time.LocalDate
import graft.operators.ScheduleExpand
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's central semantic (SURVEY §2-G1): recurring-schedule →
  * per-date expansion, checked against a trivial JVM-side model. */
class ScheduleExpandSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** JVM model: dates in [start, end] whose Monday=0 weekday bit is set. */
  private def model(start: LocalDate, end: LocalDate, mask: Int): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
      .filter(d => ((mask >> (d.getDayOfWeek.getValue - 1)) & 1) == 1)
      .toSeq

  test("known example: Mon/Wed/Fri flags over two weeks") {
    val df = Seq(("AA", "2024-01-01", "2024-01-14",
        true, false, true, false, true, false, false))
      .toDF("carrier", "eff", "disc", "day1", "day2", "day3", "day4", "day5", "day6", "day7")
      .withColumn("eff", $"eff".cast("date"))
      .withColumn("disc", $"disc".cast("date"))
    val out = ScheduleExpand.expand(df, "eff", "disc", (1 to 7).map(i => s"day$i"))
    val dates = out.select($"flightDate".cast("string")).as[String].collect().sorted
    // 2024-01-01 is a Monday: Mon/Wed/Fri over 14 days = 6 dates
    assert(dates.toSeq == Seq(
      "2024-01-01", "2024-01-03", "2024-01-05",
      "2024-01-08", "2024-01-10", "2024-01-12"))
  }

  test("50 seeded random schedules expand exactly like the JVM model") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 50).map { id =>
      val start = LocalDate.of(2023, 1, 1).plusDays(rnd.nextInt(600).toLong)
      val end = start.plusDays(rnd.nextInt(21).toLong)
      (id, start.toString, end.toString, rnd.nextInt(127) + 1)
    }
    val df = cases.toDF("id", "eff", "disc", "mask")
      .withColumn("eff", $"eff".cast("date"))
      .withColumn("disc", $"disc".cast("date"))
    val got = ScheduleExpand.expandMask(df, "eff", "disc", "mask")
      .groupBy($"id").agg(sort_array(collect_list($"flightDate".cast("string"))).as("ds"))
      .as[(Int, Seq[String])].collect().toMap
    cases.foreach { case (id, s, e, m) =>
      val exp = model(LocalDate.parse(s), LocalDate.parse(e), m).map(_.toString)
      assert(got.getOrElse(id, Nil) == exp, s"case $id [$s,$e] mask=$m")
    }
  }

  test("scalacheck: weekday-mask filter model is consistent with day-flag model") {
    val gen = for {
      off <- Gen.choose(0, 6)
      mask <- Gen.choose(1, 127)
    } yield (off, mask)
    val prop = Prop.forAll(gen) { case (off, mask) =>
      val d = LocalDate.of(2024, 1, 1).plusDays(off.toLong) // 2024-01-01 = Monday
      val flags = (0 until 7).map(k => ((mask >> k) & 1) == 1)
      flags((d.getDayOfWeek.getValue - 1)) ==
        (((mask >> ((d.getDayOfWeek.getValue - 1))) & 1) == 1)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("expansion is shuffle-free (no Exchange in the plan)") {
    val df = Tables.orders(spark, TestSpark.sfDir)
      .select($"o_orderkey", $"o_orderdate".cast("date").as("eff"))
      .withColumn("disc", date_add($"eff", 13))
      .withColumn("mask", $"o_orderkey" % 127 + 1)
    val plan = ScheduleExpand.expandMask(df, "eff", "disc", "mask")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
