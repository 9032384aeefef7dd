package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability: `observe()` named metrics ride along the job
  * (no extra pass) — the mechanism for row-count / quality gauges in a
  * production run of the ingestion pipeline. */
class ObservabilitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("observe() collects pipeline metrics without a second scan") {
    val obs = org.apache.spark.sql.Observation("ingest_metrics")
    val observed = Tables.orders(spark, TestSpark.sfDir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when($"o_orderstatus".isNull, 1).otherwise(0)).as("n_null_status"))
    val expanded = observed
      .filter($"o_orderstatus" === "F")
      .count() // single action drives both the filter and the metrics
    val metrics = obs.get
    assert(metrics("n_rows") == 1500L, metrics.toString)
    assert(metrics("n_null_status") == 0L)
    assert(expanded > 0)
  }
}
