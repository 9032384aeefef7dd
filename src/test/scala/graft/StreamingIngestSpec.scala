package graft

import java.nio.file.Files
import graft.operators.{FlightPipeline, ScheduleExpand}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** E2 as Structured Streaming: schedule extracts land as CSV files in a
  * directory; each AvailableNow run picks up ONLY the new extracts,
  * expands them through the same declarative transform as the batch path,
  * and appends to the parquet sink exactly once. */
class StreamingIngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val header =
    "carrier,flightnumber,effectiveDate,discontinuedDate,day1,day2,day3,day4,day5,day6,day7,departureAirport,arrivalAirport,departureTimeLocal,arrivalTimeLocal,departureUTCVariance,arrivalUTCVariance,arrivalDayIndicator,stops,firstSeats,businessSeats,economySeats,totalSeats,aircraftType,distanceMiles"

  private def drop(dir: String, name: String, rows: String*): Unit =
    Files.writeString(java.nio.file.Paths.get(dir, name),
      (header +: rows).mkString("\n"))

  test("incremental consumption: each extract is expanded and appended once") {
    val landing = Files.createTempDirectory("graft_landing").toString
    val out = Files.createTempDirectory("graft_ingest_out").toString + "/flights"
    val ckpt = Files.createTempDirectory("graft_ingest_ck").toString

    def runOnce(): Unit = {
      val raw = spark.readStream.schema(graft.sources.Sources.scheduleSchema)
        .option("header", "true").option("dateFormat", "yyyy-MM-dd")
        .csv(landing)
      val flights = FlightPipeline.expandAndNormalize(
        FlightPipeline.passengerOnly(raw))
      val q = flights.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // month 1 extract: AA Mon/Wed/Fri over 2 weeks = 6 instances
    drop(landing, "m1.csv",
      "AA,100,2024-01-01,2024-01-14,true,false,true,false,true,false,false,JFK,LAX,08:00,11:30,-300,-480,0,0,8,24,130,162,738,2475")
    runOnce()
    assert(spark.read.parquet(out).count() == 6)

    // month 2 extract lands: BA daily over 7 days = 7 more, AA untouched
    drop(landing, "m2.csv",
      "BA,7,2024-02-01,2024-02-07,true,true,true,true,true,true,true,LHR,JFK,10:00,13:05,0,-300,0,0,14,48,200,262,744,3451")
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() == 13, "m1 not reprocessed, m2 appended")
    assert(all.filter($"carrier" === "AA").count() == 6)
    assert(all.filter($"carrier" === "BA").count() == 7)

    // restart with nothing new: no duplicates
    runOnce()
    assert(spark.read.parquet(out).count() == 13)
  }

  test("ingest_stream_landing processes MULTIPLE microbatches (maxFilesPerTrigger=1)") {
    // The graded query writes 2 landing files and caps each microbatch at
    // one file — AvailableNow must therefore run >= 2 batches; the sink's
    // exactly-once log makes their union equal the batch result (the
    // relational half is the DuckDB oracle's job). Re-running the query fn
    // is also the DeterminismSpec repeat-idempotency contract.
    val d = "/root/testdata/sf0.001"
    val out = graft.operators.Ingest.queries("ingest_stream_landing")(spark, d)
    val landing = s"${graft.fixtureRoot}/stream_landing/landing"
    val nFiles = new java.io.File(landing).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(nFiles == 2, s"expected 2 landing files, got $nFiles")
    // commit log: one compact/commit file per microbatch under the sink's
    // _spark_metadata — proves the multi-batch path actually executed
    val meta = new java.io.File(
      s"${graft.fixtureRoot}/stream_landing/sink/_spark_metadata")
    val commits = meta.listFiles().count(!_.getName.contains("."))
    assert(commits >= 2, s"expected >=2 sink commits, got $commits")
    // streaming union == batch semantics over the same landing files
    val expect = spark.read.parquet(landing)
      .filter($"o_orderstatus" =!= "P")
      .select($"o_orderkey", $"o_orderstatus",
        round(graft.Tables.dec($"o_totalprice") * 100).cast("long").as("cents"),
        $"o_year")
    assert(out.count() == expect.count())
    assert(out.exceptAll(expect).isEmpty && expect.exceptAll(out).isEmpty)
  }
}
