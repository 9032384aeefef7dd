package graft

import graft.operators.Quantiles
import org.scalatest.funsuite.AnyFunSuite

/** Two-phase weighted median vs a brute-force reference, on the inputs
  * where bucket logic can go wrong: thresholds landing exactly on a bucket
  * boundary, negative values around the truncating-division zero bucket,
  * all-equal values, single-element groups, and randomized cases. */
class QuantilesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(String, Long, Long)]): Map[String, Long] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val tot = rs.map(_._3).sum
      val byV = rs.sortBy(_._2)
      var cum = 0L
      val med = byV.collectFirst {
        case (_, v, w) if { cum += w; 2 * cum >= tot } => v
      }.get
      g -> med
    }

  private def twoPhase(rows: Seq[(String, Long, Long)],
                       width: Long): Map[String, Long] =
    Quantiles.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w", width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("threshold exactly at a bucket boundary") {
    // group a: weights 5+5; the 2*cum >= tot threshold is met precisely by
    // the last value of bucket 0 (v=99, width 100) — the next bucket must
    // NOT be chosen
    val rows = Seq(("a", 99L, 5L), ("a", 100L, 5L))
    assert(twoPhase(rows, 100L) == brute(rows))
    assert(twoPhase(rows, 100L)("a") == 99L)
  }

  test("negative values straddling the zero bucket") {
    val rows = Seq(("n", -250L, 1L), ("n", -150L, 1L), ("n", -50L, 1L),
      ("n", 50L, 1L), ("n", 250L, 1L))
    for (w <- Seq(3L, 100L, 1000L))
      assert(twoPhase(rows, w) == brute(rows), s"width=$w")
  }

  test("all-equal values, single rows, and multiple groups") {
    val rows = Seq(("e", 7L, 2L), ("e", 7L, 3L), ("s", 42L, 1L),
      ("m", 1L, 1L), ("m", 2L, 1L), ("m", 3L, 1L))
    val got = twoPhase(rows, 10L)
    assert(got == brute(rows))
    assert(got("e") == 7L && got("s") == 42L && got("m") == 2L)
  }

  test("randomized agreement with brute force") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val rows = (1 to 200).map { _ =>
        (s"g${rnd.nextInt(3)}", rnd.nextLong() % 1000, rnd.nextInt(9) + 1L)
      }
      for (w <- Seq(7L, 64L, 100000L))
        assert(twoPhase(rows, w) == brute(rows), s"trial=$trial width=$w")
    }
  }
}
