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

    // The GRADED shape (join_skewed_hotkey), scaled: sf0.1 lineitem
    // replicated 100x to ~64M rows, same 90%-one-key derivation, same
    // 100-row dim. The replication multiplies cents by a row-unique offset
    // so the checksum is layout-sensitive, then the three variants run the
    // exact graded dataflow.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // repartition BEFORE the 100x explode: a real cluster's fact scan has
    // many tasks; without this the join shuffle has 1-2 map tasks, which
    // both bottlenecks the pipeline and makes skewed partitions
    // unsplittable (AQE splits by map-output ranges — same lesson as the
    // PlanShapeSpec AQE pin).
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(cpus.toInt)
    val gFact = li.select(
        when($"l_orderkey" % 10 < 9, 0L)
          .otherwise($"l_partkey" % 100).as("hk"),
        round($"l_extendedprice".cast("decimal(18,6)") * 100).cast("long").as("cents"))
      .withColumn("r", explode(array((0 until 100).map(lit): _*)))
      .select($"hk", ($"cents" + $"r").as("v"))
    val gDim = spark.read.parquet(s"$sfDir/supplier.parquet")
      .groupBy(($"s_suppkey" % 100).as("dk"))
      .agg(min($"s_nationkey".cast("long")).as("w"))
      .localCheckpoint()
    def gNaive(): Long = gFact.hint("merge").join(gDim, $"hk" === $"dk")
      .agg(sum($"v" * $"w")).as[Long].head()
    def gSalted(): Long = operators.Scale
      .saltedJoin(gFact.hint("merge"), gDim, "hk", "dk", 32)
      .agg(sum($"v" * $"w")).as[Long].head()
    val gRows = gFact.count()
    val gw = time(aqe = false)(gNaive())
    val gtNaive = time(aqe = false)(gNaive())
    val gtSalted = time(aqe = false)(gSalted())
    val gtAqe = time(aqe = true)(gNaive())
    val gCheck = gNaive() == gSalted()
    println(s"""{"metric":"skew_join_graded_shape","unit":"sec","naive":$gtNaive,""" +
      s""""salted":$gtSalted,"aqe":$gtAqe,"warmup":$gw,""" +
      s""""salted_speedup":${gtNaive / gtSalted},"rows":$gRows,"checksum_equal":$gCheck}""")
    spark.stop()
  }
}
