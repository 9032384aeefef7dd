package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures RangeJoinRewrite: the same keyless band join
  * `abs(a.t − b.t) <= c` with the optimizer rule ON (cell-replicated
  * equi-join) vs OFF (BroadcastNestedLoopJoin), same checksum both ways.
  *
  * Shape: n uniformly spread event times, band width chosen so the
  * expected match count stays modest while the naive plan still evaluates
  * all n² pairs. Run: `sbt "runMain graft.RangeJoinBench [n]"`.
  */
object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 40000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.plans.RangeJoinRewrite.install(spark)

    // deterministic scattered timestamps over n*200 ticks → ~2.5 expected
    // band partners per row (non-trivial match set for the checksum)
    val ev = spark.range(n)
      .select($"id".as("eid"),
        (($"id" * 2654435761L) % (n * 200L)).as("t"))
      .localCheckpoint()
    val a = ev.select($"eid".as("a_id"), $"t".as("a_t"))
    val b = ev.select($"eid".as("b_id"), $"t".as("b_t"))
    def q = a.join(b, abs($"a_t" - $"b_t") <= lit(500L) && $"a_id" < $"b_id")
      .agg(count(lit(1)), sum($"a_id" + $"b_id"))

    def run(tag: String): (Double, String) = {
      val t0 = System.nanoTime()
      val row = q.collect().head
      ((System.nanoTime() - t0) / 1e9, row.toString)
    }
    spark.conf.set("spark.graft.rangeJoin", "true")
    run("warm")
    val (tOn, sumOn) = run("on")
    spark.conf.set("spark.graft.rangeJoin", "false")
    val (tOff, sumOff) = run("off")
    require(sumOn == sumOff, s"checksum mismatch: $sumOn vs $sumOff")
    println(f"[rjbench] n=$n rewrite=ON ${tOn}%.2f s  rewrite=OFF ${tOff}%.2f s  " +
      f"speedup=${tOff / tOn}%.1f x  checksum=$sumOn")
    spark.stop()
  }
}
