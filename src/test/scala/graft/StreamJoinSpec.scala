package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream inner join with watermarked time-bound state — the
  * remaining Structured Streaming join shape (ad-click attribution
  * pattern): clicks join impressions within a bounded interval, state on
  * both sides expired by watermark + range condition. */
class StreamJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stream-stream join attributes clicks to impressions within bounds") {
    implicit val ctx = spark.sqlContext
    val impressions = MemoryStream[(Long, Long)] // (ad_id, epoch_s)
    val clicks = MemoryStream[(Long, Long)]
    val impDf = impressions.toDF().toDF("ad_id", "imp_s")
      .withColumn("imp_t", timestamp_seconds($"imp_s"))
      .withWatermark("imp_t", "20 seconds")
    val clkDf = clicks.toDF().toDF("c_ad_id", "clk_s")
      .withColumn("clk_t", timestamp_seconds($"clk_s"))
      .withWatermark("clk_t", "20 seconds")
    val joined = impDf.join(clkDf,
      $"ad_id" === $"c_ad_id" &&
      $"clk_t" >= $"imp_t" && $"clk_t" <= $"imp_t" + expr("INTERVAL 10 SECONDS"))
      .select($"ad_id", $"imp_s", $"clk_s")
    val q = joined.writeStream.format("memory").queryName("graft_ss_join")
      .outputMode("append").start()
    try {
      impressions.addData((1L, 100L), (2L, 100L), (3L, 200L))
      clicks.addData((1L, 105L), (2L, 130L), (3L, 205L)) // 2's click outside +10s
      q.processAllAvailable()
      impressions.addData((9L, 400L)) // advance watermark to flush
      clicks.addData((9L, 430L))
      q.processAllAvailable()
      val rows = spark.table("graft_ss_join").as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 105L), (3L, 200L, 205L)),
        s"only in-window attributions: $rows")
    } finally q.stop()
  }

  test("stream-static join enriches events against a broadcast dimension") {
    implicit val ctx = spark.sqlContext
    val events = MemoryStream[(Long, Long)] // (nation_key, amount)
    val dim = Tables.nation(spark, TestSpark.sfDir)
      .select($"n_nationkey", $"n_name")
    val enriched = events.toDF().toDF("nk", "amount")
      .join(broadcast(dim), $"nk" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum($"amount").as("total"))
    val q = enriched.writeStream.format("memory").queryName("graft_ssj_dim")
      .outputMode("complete").start()
    try {
      events.addData((0L, 10L), (1L, 20L), (0L, 5L), (99L, 7L)) // 99: no dim row
      q.processAllAvailable()
      val rows = spark.table("graft_ssj_dim").as[(String, Long)].collect().toMap
      assert(rows.values.sum == 35L && rows.size == 2,
        s"two enriched nations, unmatched key dropped: $rows")
      // the static side must plan as a broadcast join inside the microbatch
      val prog = q.lastProgress
      assert(prog.numInputRows == 4, s"all four events ingested: $prog")
    } finally q.stop()
  }
}
