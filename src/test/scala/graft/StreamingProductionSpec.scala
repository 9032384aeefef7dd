package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Production-scale streaming modes: RocksDB state store provider,
  * append-mode session windows under watermark, and the foreachBatch
  * incremental-upsert pattern (the reference's E2 consumption shape on a
  * real sink). */
class StreamingProductionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stateful aggregation runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val got = streaming.Streams.queries("stream_tumbling")(spark, TestSpark.sfDir)
      val batch = Tables.events(spark, TestSpark.sfDir)
        .withColumn("ts_us", Tables.tsUs)
        .withColumn("bucket_us", expr("ts_us - ts_us % 3600000000"))
        .groupBy($"bucket_us", $"event_type").count()
      assert(got.count() == batch.count(), "RocksDB-backed result matches batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session windows emit finalized sessions in append mode") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user, epoch_s)
    val agg = mem.toDF().toDF("user", "sec")
      .withColumn("t", timestamp_seconds($"sec"))
      .withWatermark("t", "10 seconds")
      .groupBy(session_window($"t", "60 seconds"), $"user")
      .agg(count(lit(1)).as("n"))
      .select($"user", unix_timestamp($"session_window.start").as("start_s"), $"n")
    val q = agg.writeStream.format("memory").queryName("graft_sess_append")
      .outputMode("append").start()
    try {
      mem.addData((1L, 100L), (1L, 130L), (1L, 300L)) // two sessions for user 1
      q.processAllAvailable()
      mem.addData((9L, 1000L)) // push watermark past both sessions
      q.processAllAvailable()
      mem.addData((9L, 2000L))
      q.processAllAvailable()
      val rows = spark.table("graft_sess_append").as[(Long, Long, Long)]
        .collect().toSet
      assert(rows.contains((1L, 100L, 2L)) && rows.contains((1L, 300L, 1L)),
        s"finalized sessions: $rows")
    } finally q.stop()
  }

  test("foreachBatch applies incremental upsert batches to a parquet target (E2)") {
    val target = Files.createTempDirectory("graft_fb").toString + "/t"
    // seed target: key -> value v1
    Seq((1L, "v1"), (2L, "v1")).toDF("k", "v").write.parquet(target)
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val existing = spark.read.parquet(target)
        val merged = existing.join(batch, Seq("k"), "left_anti")
          .unionByName(batch) // delete-insert upsert per micro-batch
        val tmp = target + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(target)
      }
      .trigger(Trigger.AvailableNow()).start()
    mem.addData((2L, "v2"), (3L, "v2"))
    q.awaitTermination()
    val got = spark.read.parquet(target).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "v1", 2L -> "v2", 3L -> "v2"),
      s"upserted target: $got")
  }
}
