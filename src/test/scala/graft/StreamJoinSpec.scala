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
}
