package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2-I6: watermark late-data dropping — inherently multi-batch, driven by
  * a scripted MemoryStream; plus cross-batch streaming dedup (I4). */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("I6: rows older than the watermark are dropped") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Long]
    val agg = mem.toDF()
      .select(timestamp_seconds($"value").as("t"))
      .withWatermark("t", "10 seconds")
      .groupBy(window($"t", "10 seconds")).count()
      .select(unix_timestamp($"window.start").as("w"), $"count")
    val q = agg.writeStream.format("memory").queryName("graft_late")
      .outputMode("append").start()
    try {
      mem.addData(0L, 5L, 100L)   // watermark after this batch: 100 - 10 = 90
      q.processAllAvailable()
      mem.addData(3L, 200L)       // 3L lands in window [0,10) — already late
      q.processAllAvailable()
      mem.addData(300L)           // push watermark so [100,110) etc. finalize
      q.processAllAvailable()
      val counts = spark.table("graft_late").as[(Long, Long)].collect().toMap
      assert(counts.getOrElse(0L, 0L) == 2L,
        s"late row must be dropped from window [0,10): $counts")
    } finally q.stop()
  }

  test("I4 shape: streaming dedup holds state across batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val deduped = mem.toDF().toDF("id", "kind")
      .dropDuplicates("id")
    val q = deduped.writeStream.format("memory").queryName("graft_dedup_batches")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((1L, "later-dup"), (3L, "c"))
      q.processAllAvailable()
      val rows = spark.table("graft_dedup_batches").as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")),
        s"cross-batch duplicate must be suppressed: $rows")
    } finally q.stop()
  }
}
