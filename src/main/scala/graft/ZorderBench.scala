package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured demo for the codegen MortonInterleave expression (not part of
  * the graded registry): compute the 10-bit Z-order key for 64M rows via
  * (a) the HOF fold `aggregate(sequence(...))` — per-row index array +
  * lambda frames — and (b) the native codegen expression — a shift/mask
  * loop inside whole-stage codegen. Both sides aggregate the keys
  * (sum + count) so the comparison measures expression throughput, not
  * collect. Prints one JSON line {hof_sec, expr_sec, checksum}; numbers
  * recorded in SCALING.md. Run: sbt "runMain graft.ZorderBench".
  */
object ZorderBench {

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
    val t = spark.range(n).select(
      ($"id" % 1024).as("x"),
      ((hash($"id").cast("long")).bitwiseAND(1023L)).as("y"))

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def hofForm = t.select(expr(
        """aggregate(sequence(0, 9), cast(0 as bigint), (acc, k) ->
          |  acc + shiftleft(shiftright(x, k) & 1, 2 * k)
          |      + shiftleft(shiftright(y, k) & 1, 2 * k + 1)) AS z"""
          .stripMargin))
      .agg(sum($"z")).as[Long].head()
    def exprForm = t.select(
        graft.plans.MortonInterleave.morton($"x", $"y", 10).as("z"))
      .agg(sum($"z")).as[Long].head()

    time(exprForm) // warm scan + codegen
    val (hSec, hSum) = time(hofForm)
    val (eSec, eSum) = time(exprForm)
    require(hSum == eSum, s"checksum mismatch: $hSum vs $eSum")
    println(f"""{"hof_sec":$hSec%.2f,"expr_sec":$eSec%.2f,"checksum":$hSum}""")
    spark.stop()
  }
}
