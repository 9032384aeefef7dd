package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning — static (literal filters skip directories) and
  * dynamic (a selective dim filter prunes fact partitions at runtime):
  * the two mechanisms that turn a 100 TB scan into a GB-scale one. */
class PruningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val factPath = {
    val p = Files.createTempDirectory("graft_dpp").toString + "/fact"
    Tables.orders(spark, TestSpark.sfDir)
      .withColumn("status", $"o_orderstatus")
      .write.partitionBy("status").parquet(p)
    p
  }

  test("static pruning: a literal partition filter reads one directory") {
    val df = spark.read.parquet(factPath).filter($"status" === "F")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), scan.take(300))
    assert(df.count() ==
      Tables.orders(spark, TestSpark.sfDir).filter($"o_orderstatus" === "F").count())
  }

  test("dynamic partition pruning: dim filter prunes fact partitions") {
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    try {
      // allow DPP even when the dim side isn't broadcast-reused
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      // DPP requires a selective predicate over a real (non-local) dim scan
      val dimPath = Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
      Seq(("F", "final"), ("O", "open"), ("P", "pending"))
        .toDF("s", "label").write.parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter($"label" === "final")
      val j = spark.read.parquet(factPath)
        .join(broadcast(dim), $"status" === $"s")
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dynamicpruning"),
        s"expected a DPP subquery:\n${optimized.take(600)}")
      assert(j.count() ==
        Tables.orders(spark, TestSpark.sfDir).filter($"o_orderstatus" === "F").count())
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev)
  }
}
