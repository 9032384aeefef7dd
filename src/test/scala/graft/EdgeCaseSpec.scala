package graft

import graft.functions.AnnSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge behavior of the custom expression layer — documented, not
  * accidental. */
class EdgeCaseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("DotFold: empty arrays, nulls, mismatched lengths") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),   // plain: 11
      (2L, Seq.empty[Double], Seq.empty[Double]), // empty: 0
      (3L, Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0))    // mismatch: min-length fold = 11
    ).toDF("id", "a", "b")
    val got = df.select($"id", AnnSearch.dot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 11.0, 2L -> 0.0, 3L -> 11.0))
    // null input -> null output (BinaryExpression null semantics)
    val n = df.select(AnnSearch.dot(lit(null).cast("array<double>"), $"b").as("d"))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("DotFold interpreted eval matches codegen") {
    // force interpreted path via eval on the expression directly
    val e = graft.plans.DotFold(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 11.0)
  }

  test("tsUs truncates exactly at µs boundaries") {
    val df = Seq(1704067200000000999L, 1704067200000000000L, 999L)
      .toDF("ts")
      .select(Tables.tsUs.as("us"))
    assert(df.as[Long].collect().toSeq ==
      Seq(1704067200000000L, 1704067200000000L, 0L))
  }
}
