package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured demo for the custom two-phase top-k operator (not part of the
  * graded registry): 32M rows over 1k groups, k=3 — the window
  * `row_number() <= k` form must shuffle and sort all 32M rows; the
  * custom operator (plans/TopKPerGroup.scala) shuffles at most
  * k·|groups| rows per map partition. Prints one JSON line
  * {window_sec, custom_sec, rows}; numbers recorded in SCALING.md.
  * Run: sbt "runMain graft.TopKBench".
  */
object TopKBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 32000000L
    // a ~200-byte payload column: the regime where shuffle BYTES dominate —
    // i.e. what a real top-k over documents/events rows looks like
    val t = spark.range(n).select(
      ($"id" % 1000).as("g"),
      (hash($"id").cast("long")).as("v"),
      $"id".as("k"),
      repeat(conv(hash($"id").cast("long"), 10, 16), 12).as("payload"))

    def time(body: => Array[_]): (Double, Int) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r.length)
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"k".asc)
    def windowForm = t.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select($"g", $"v", $"k", $"payload").collect()
    def customForm = graft.plans.TopKPerGroup(
      t, Seq("g"), Seq(("v", false), ("k", true)), 3).collect()

    time(windowForm) // warm scan + codegen
    val (wSec, wRows) = time(windowForm)
    val (cSec, cRows) = time(customForm)
    require(wRows == cRows, s"row-count mismatch: $wRows vs $cRows")
    val sameSet = windowForm.map(_.toString).toSet == customForm.map(_.toString).toSet
    require(sameSet, "row sets differ")
    println(f"""{"window_sec":$wSec%.2f,"custom_sec":$cSec%.2f,"rows":$wRows}""")
    spark.stop()
  }
}
