package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured skew-mitigation demo (not part of the graded query registry).
  *
  * Shape: a 64M-row probe where 90% of rows share ONE key, equi-joined to a
  * 100k-row build side, with broadcast disabled — the fact-fact shuffle
  * join shape where one reducer receives 57.6M rows and the other 31 sit
  * idle. Three measured variants:
  *   naive      — plain sort-merge join, AQE off (the pathological plan)
  *   salted     — [[operators.Scale.saltedJoin]] with 32 salts, AQE off
  *   aqe        — plain join with AQE skew-join splitting enabled
  * Prints one JSON line with seconds per variant; numbers are recorded in
  * SCALING.md. Run: sbt "runMain graft.SkewBench".
  */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nProbe = 64000000L
    val nBuild = 100000L
    // 90% of probe rows hit key 0; the rest spread over the key space.
    val probe = spark.range(nProbe)
      .select(when($"id" % 10 < 9, 0L).otherwise($"id" % nBuild).as("k"),
        ($"id" % 1000).as("v"))
    val build = spark.range(nBuild)
      .select($"id".as("bk"), ($"id" * 7 % 997).as("w"))

    def time(aqe: Boolean)(body: => Long): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // checksum forces full join execution; identical across variants.
    def naive(): Long = probe.join(build, $"k" === $"bk")
      .agg(sum($"v" * $"w")).as[Long].head()
    def salted(): Long = operators.Scale.saltedJoin(probe, build, "k", "bk", 32)
      .agg(sum($"v" * $"w")).as[Long].head()

    val warm = time(aqe = false)(naive()) // JIT/codegen warmup, discarded
    val tNaive = time(aqe = false)(naive())
    val tSalted = time(aqe = false)(salted())
    val tAqe = time(aqe = true)(naive())
    val check = naive() == salted()
    println(s"""{"metric":"skew_join","unit":"sec","naive":$tNaive,""" +
      s""""salted":$tSalted,"aqe":$tAqe,"warmup":$warm,""" +
      s""""salted_speedup":${tNaive / tSalted},"rows":$nProbe,"checksum_equal":$check}""")
    spark.stop()
  }
}
