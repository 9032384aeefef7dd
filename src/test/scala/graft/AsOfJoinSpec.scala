package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin library semantics: strict priority, ts-collision handling,
  * tolerance variant. */
class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 150L, "p3"), (3L, 50L, "p4"))
    .toDF("k", "ts", "tag")
  private val right = Seq(
    (1L, 100L), (1L, 180L), (2L, 10L), (2L, 150L))
    .toDF("k", "ts")

  test("strictly-prior semantics, including exact ts collisions") {
    val got = AsOfJoin.asOfPrior(left, right, "k", "ts")
      .select($"tag", $"asof_ts").as[(String, Option[Long])]
      .collect().toMap
    assert(got == Map(
      "p1" -> None,        // right@100 is NOT prior to left@100 (strict <)
      "p2" -> Some(180L),
      "p3" -> Some(10L),   // right@150 collides -> excluded, falls back to 10
      "p4" -> None))       // key 3 has no right rows
  }

  test("tolerance variant nulls out matches older than maxGap") {
    val got = AsOfJoin.asOfPriorWithin(left, right, "k", "ts", maxGap = 30L)
      .select($"tag", $"asof_ts").as[(String, Option[Long])]
      .collect().toMap
    assert(got("p2") == Some(180L)) // gap 20 <= 30
    assert(got("p3") == None)       // gap 140 > 30
  }
}
