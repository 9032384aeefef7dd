package graft

import java.nio.file.Files
import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew + co-location utilities: result equivalence and plan shape. */
class ScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join") {
    val l = Tables.lineitem(spark, TestSpark.sfDir)
      .select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, TestSpark.sfDir)
      .select($"o_orderkey", $"o_orderpriority")
    val plain = l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Scale.saltedJoin(l, o, "l_orderkey", "o_orderkey", 8)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("hotKeyJoin is row-identical to the plain join") {
    val ev = Tables.events(spark, TestSpark.sfDir).select($"event_id", $"user_id")
    val users = Tables.events(spark, TestSpark.sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("n_total"))
    val plain = ev.join(users, "user_id").count()
    val hot = Scale.hotKeyJoin(ev, users.withColumnRenamed("user_id", "u2"),
      "user_id", "u2", lit(0L)).count()
    assert(hot == plain)
  }

  test("AQE splits skewed join partitions at runtime") {
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key holding ~50% of 200k rows vs a uniform build side
      val probe = spark.range(200000)
        .select(when($"id" % 2 === 0, 7L).otherwise($"id").as("k"), $"id".as("v"))
      val build = spark.range(200000).select($"id".as("k2"), ($"id" * 2).as("w"))
      val j = probe.join(build, $"k" === $"k2")
      // collect() executes j's own queryExecution (count() would plan a
      // separate aggregate query and leave this one unexecuted)
      assert(j.collect().length == 200000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the skewed join:\n${finalPlan.take(800)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("compact merges a many-small-files directory, preserving rows") {
    val base = Files.createTempDirectory("graft_compact").toString
    val src = s"$base/src"
    Tables.lineitem(spark, TestSpark.sfDir).repartition(64)
      .write.parquet(src) // 64 tiny files
    val before = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"setup should create many files, got $before")
    graft.operators.Scale.compact(spark, src, s"$base/out", targetFileMB = 128,
      sortCols = Seq("l_orderkey"))
    val after = new java.io.File(s"$base/out").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after <= 4, s"compacted to few files, got $after")
    assert(spark.read.parquet(s"$base/out").count() ==
      spark.read.parquet(src).count(), "row count preserved")
  }

  test("sorted compaction enables parquet row-group min-max skipping") {
    val base = Files.createTempDirectory("graft_skip").toString
    // small row groups so one file holds many skippable groups
    val prev = spark.conf.get("spark.sql.parquet.columnarReaderBatchSize", "4096")
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 64 * 1024)
    try {
      def scannedRows(path: String): Long = {
        // range predicate over ~1% of the key domain: with clustered row
        // groups only the first group's min-max overlaps; with shuffled
        // groups every group contains some key in range, so nothing skips
        val scan = spark.read.parquet(path).filter($"l_orderkey" <= 60L)
        scan.collect()
        scan.queryExecution.executedPlan.collectLeaves()
          .head.metrics("numOutputRows").value
      }
      graft.operators.Scale.compact(spark, s"${TestSpark.sfDir}/lineitem.parquet",
        s"$base/clustered", targetFileMB = 128, sortCols = Seq("l_orderkey"))
      // same data, same row-group size, shuffled layout: every group spans
      // the whole key range, so min-max stats can't skip anything
      Tables.lineitem(spark, TestSpark.sfDir)
        .orderBy($"l_partkey") // uncorrelated with the filter key
        .coalesce(1).write.parquet(s"$base/shuffled")
      val clustered = scannedRows(s"$base/clustered")
      val shuffled = scannedRows(s"$base/shuffled")
      assert(clustered * 3 <= shuffled,
        s"clustering must let min-max stats skip row groups: " +
          s"clustered scan $clustered rows vs shuffled $shuffled")
    } finally {
      spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", prev)
    }
  }

  test("bucketed tables join without any Exchange") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val l = Tables.lineitem(spark, TestSpark.sfDir).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, TestSpark.sfDir).select($"o_orderkey", $"o_totalprice")
    Scale.writeBucketed(l, "graft_bl", s"$base/l", 8, "l_orderkey")
    Scale.writeBucketed(o, "graft_bo", s"$base/o", 8, "o_orderkey")
    // disable auto-broadcast so the planner actually uses the bucketed
    // sort-merge path (at real fact-fact scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bl")
        .join(spark.table("graft_bo"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(joined.count() == l.count(), "every lineitem matches its order")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom-filter injection prunes the probe side of a selective join") {
    // Catalyst's InjectRuntimeFilter: when one join side carries a selective
    // filter, the optimizer plants a bloom_filter_agg subquery on it and a
    // might_contain predicate on the OTHER side's scan — at 100 TB this is
    // what turns "shuffle all of lineitem, then join" into "drop most of
    // lineitem at the scan". Thresholds are lowered so the sf-small fixture
    // qualifies; assert both the plan shape and result equivalence.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val l = Tables.lineitem(spark, TestSpark.sfDir)
        .select($"l_orderkey", $"l_quantity")
      val o = Tables.orders(spark, TestSpark.sfDir)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val joined = l.join(o, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter:\n${plan.take(1500)}")
      val n = joined.count()
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      try assert(n == l.join(o, $"l_orderkey" === $"o_orderkey").count(),
        "bloom-filtered join must not change the result")
      finally spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
