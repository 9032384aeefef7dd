package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the MergeSink partition-COW claim: applying a change batch
  * that touches 1 of P partitions must cost ~1/P of rewriting the table,
  * because the pruned read and the dynamic overwrite both scale with the
  * AFFECTED SLICE, not the table.
  *
  * Shape: n rows hash-spread over P date-like partitions, a change batch
  * upserting 1% of ONE partition; compared against the naive strategy a
  * pipeline without partition-COW falls back to (full-table read → merge
  * → full overwrite), same final checksum both ways.
  *
  * Run: `sbt "runMain graft.MergeBench [n] [partitions]"`.
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val parts = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def base = spark.range(n).select(
      $"id".as("k"),
      ($"id" * 7 % 1000003).as("v"),
      (($"id" * 2654435761L) % parts).cast("string").as("p"))
    def changes = base.filter($"p" === "3" && $"k" % 100 === 0)
      .select($"k", ($"v" + 1).as("v"), $"p", lit("U").as("op"), lit(1L).as("seq"))

    def checksum(path: String): String =
      spark.read.parquet(path)
        .agg(count(lit(1)), sum($"k"), sum($"v")).collect().head.toString

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // --- partition-COW merge (the engine's sink) ---
    val cowDir = java.nio.file.Files.createTempDirectory("graft_mb_cow").toString + "/t"
    base.write.partitionBy("p").mode("overwrite").parquet(cowDir)
    val (tCow, _) = timed {
      sources.MergeSink.mergeInto(spark, cowDir, changes, Seq("k"), "p")
    }

    // --- naive full-table merge (read all, merge, rewrite all) ---
    val fullDir = java.nio.file.Files.createTempDirectory("graft_mb_full").toString + "/t"
    base.write.partitionBy("p").mode("overwrite").parquet(fullDir)
    val (tFull, _) = timed {
      import org.apache.spark.sql.expressions.Window
      val tgt = spark.read.parquet(fullDir)
        .withColumn("p", $"p".cast("string"))
      val w = Window.partitionBy($"k", $"p").orderBy($"__src".desc, $"__seq".desc)
      val merged = tgt
        .withColumn("__op", lit(null: String)).withColumn("__src", lit(0))
        .withColumn("__seq", lit(0L))
        .unionByName(changes.withColumnRenamed("op", "__op")
          .withColumn("__src", lit(1)).withColumn("__seq", $"seq").drop("seq"))
        .withColumn("__rn", row_number().over(w))
        .filter($"__rn" === 1 && ($"__op".isNull || $"__op" =!= "D"))
        .select($"k", $"v", $"p")
        .localCheckpoint()
      merged.write.partitionBy("p").mode("overwrite").parquet(fullDir)
    }

    val (cs1, cs2) = (checksum(cowDir), checksum(fullDir))
    println(f"[mergebench] n=$n partitions=$parts cow=$tCow%.2f s full=$tFull%.2f s " +
      f"speedup=${tFull / tCow}%.1fx checksums_equal=${cs1 == cs2} ($cs1)")
    spark.stop()
  }
}
