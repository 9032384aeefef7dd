package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured approximate-query-processing demo (not part of the graded
  * registry): exact `count(DISTINCT x)` vs the HLL++ rewrite that
  * [[graft.plans.ApproxDistinctRewrite]] applies session-wide.
  *
  * Shape: a generated high-cardinality table (64M rows, ~16M distinct
  * keys, 8 groups) — the regime where exact distinct must shuffle every
  * distinct value while HLL shuffles one sketch per group per partition.
  * Prints one JSON line {exact_sec, approx_sec, max_rel_err}; numbers are
  * recorded in SCALING.md. Run: sbt "runMain graft.AqpBench".
  */
object AqpBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 64000000L
    // key space 16M → ~16M distinct per full table, split into 8 groups
    val t = spark.range(n).select(
      ($"id" % 8).cast("string").as("g"),
      (hash($"id").cast("long") % 16000000L).as("k"))

    def run(expr: org.apache.spark.sql.Column): (Double, Map[String, Long]) = {
      val t0 = System.nanoTime()
      val rows = t.groupBy($"g").agg(expr.as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    run(count_distinct($"k")) // warm the scan/codegen path
    val (exactSec, exact) = run(count_distinct($"k"))
    val (approxSec, approx) = run(approx_count_distinct($"k", 0.05))
    val errs = exact.map { case (g, v) =>
      math.abs(approx(g) - v).toDouble / v }
    println(f"""{"exact_sec":$exactSec%.2f,"approx_sec":$approxSec%.2f,""" +
      f""""mean_rel_err":${errs.sum / errs.size}%.4f,""" +
      f""""max_rel_err":${errs.max}%.4f}""")
    spark.stop()
  }
}
