package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion robustness (the reference is first and foremost a parser):
  * malformed CSV rows under PERMISSIVE capture instead of crash, and the
  * streaming file sink is exactly-once across restarts. */
class RobustnessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("PERMISSIVE CSV ingest captures malformed rows in _corrupt_record") {
    val dir = Files.createTempDirectory("graft_corrupt").toFile
    val f = new java.io.File(dir, "bad.csv")
    Files.writeString(f.toPath,
      """carrier,flightnumber,effectiveDate
        |AA,100,2024-01-01
        |BB,not_a_number,2024-01-02
        |CC,300,not_a_date
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("carrier", StringType),
      StructField("flightnumber", IntegerType),
      StructField("effectiveDate", DateType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(f.getAbsolutePath)
      .cache()
    assert(df.count() == 3, "no rows dropped")
    val bad = df.filter($"_corrupt_record".isNotNull)
      .select($"carrier").as[String].collect().toSet
    assert(bad == Set("BB", "CC"), s"malformed rows captured: $bad")
    assert(df.filter($"carrier" === "AA").head().getAs[String]("_corrupt_record") == null)
  }

  test("streaming parquet file sink is exactly-once across query restarts") {
    val in = Files.createTempDirectory("graft_sink_in").toString
    val out = Files.createTempDirectory("graft_sink_out").toString + "/data"
    val ckpt = Files.createTempDirectory("graft_sink_ck").toString
    val schema = StructType(Seq(StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType), StructField("n_regionkey", IntegerType)))
    val nation = Tables.nation(spark, TestSpark.sfDir)
    nation.filter($"n_nationkey" < 10).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 10)
    // restart with no new data: nothing re-emitted
    runOnce()
    assert(spark.read.parquet(out).count() == 10, "no duplicates after restart")
    // add a second batch of files; only the delta lands
    nation.filter($"n_nationkey" >= 10).write.mode("append").parquet(in)
    runOnce()
    val got = spark.read.parquet(out)
    assert(got.count() == 25, "delta processed exactly once")
    assert(got.select("n_nationkey").distinct().count() == 25)
  }
}
