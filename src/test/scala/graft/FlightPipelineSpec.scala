package graft

import java.nio.file.Files
import graft.operators.FlightPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end fidelity test of the reference's pipeline lifecycle (E1–E3):
  * CSV → validate → expand → UTC normalize → enrich → partitioned sink,
  * plus idempotent window upsert. */
class FlightPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_fp").toFile
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  private val schedules = write("schedule.csv",
    """carrier,flightnumber,effectiveDate,discontinuedDate,day1,day2,day3,day4,day5,day6,day7,departureAirport,arrivalAirport,departureTimeLocal,arrivalTimeLocal,departureUTCVariance,arrivalUTCVariance,arrivalDayIndicator,stops,firstSeats,businessSeats,economySeats,totalSeats,aircraftType,distanceMiles
      |AA,100,2024-01-01,2024-01-14,true,false,true,false,true,false,false,JFK,LAX,08:00,11:30,-300,-480,0,0,8,24,130,162,738,2475
      |BA,7,2024-01-01,2024-01-07,true,true,true,true,true,true,true,LHR,JFK,22:00,01:05,0,-300,1,0,14,48,200,262,744,3451
      |FRT,900,2024-01-01,2024-01-07,true,true,true,true,true,true,true,JFK,LAX,03:00,06:00,-300,-480,0,0,0,0,0,0,76F,2475
      |XX,1,2024-02-01,2024-01-01,true,true,true,true,true,true,true,JFK,LAX,08:00,09:00,-300,-480,0,0,1,1,1,3,738,100""".stripMargin)

  private val airports = write("airports.csv",
    """iata,name,city,state,countryCode,countryName,globalRegion,wac,longitude,latitude
      |JFK,Kennedy,New York,NY,US,United States,North America,22,-73.78,40.64
      |LAX,Los Angeles Intl,Los Angeles,CA,US,United States,North America,91,-118.41,33.94
      |LHR,Heathrow,London,,GB,United Kingdom,Europe,496,-0.45,51.47""".stripMargin)

  test("E1: full import — validate, filter, expand, normalize, enrich, sink") {
    val out = Files.createTempDirectory("graft_fp_out").toString + "/flights"
    val (flights, rejects) = FlightPipeline.runImport(spark, schedules, airports, out)

    // XX has an inverted date range → rejected with reason
    assert(rejects.select($"carrier", $"__reject_reason").as[(String, String)]
      .collect().toSet == Set(("XX", "inverted_range")))
    // FRT is freight (0 seats) → filtered, AA Mon/Wed/Fri ×2wk = 6, BA daily ×7
    val byCarrier = flights.groupBy($"carrier").count()
      .as[(String, Long)].collect().toMap
    assert(byCarrier == Map("AA" -> 6L, "BA" -> 7L))

    // UTC normalization: AA dep 08:00 local, variance -300min (UTC-5) →
    // 13:00 UTC on 2024-01-01 = 1704114000000000 µs
    val aaDep = flights.filter($"carrier" === "AA" &&
        $"flight_date" === lit("2024-01-01").cast("date"))
      .select($"dep_utc_us").as[Long].head()
    assert(aaDep == 1704114000000000L)
    // BA overnight arrival (+1 day): arr 01:05 local −(−300) on Jan 2 →
    // duration positive and sane
    val baDur = flights.filter($"carrier" === "BA").select($"duration_min")
      .as[Long].collect()
    assert(baDur.forall(d => d > 0 && d < 24 * 60), baDur.mkString(","))

    // enrichment joined both endpoints
    val ba = flights.filter($"carrier" === "BA").head()
    assert(ba.getAs[String]("dep_country") == "GB" && ba.getAs[String]("arr_country") == "US")

    // enrichment joins are broadcast (the fact side never shuffles)
    val raw = graft.sources.Sources.readCsv(spark, schedules,
      graft.sources.Sources.scheduleSchema)
    val enrichPlan = FlightPipeline.enrich(
        FlightPipeline.expandAndNormalize(
          FlightPipeline.passengerOnly(FlightPipeline.validate(raw)._1)),
        graft.sources.Sources.readCsv(spark, airports,
          graft.sources.Sources.airportsSchema))
      .queryExecution.executedPlan.toString
    assert(enrichPlan.contains("BroadcastHashJoin"),
      s"airports enrichment should broadcast:\n${enrichPlan.take(600)}")
    assert(!enrichPlan.contains("SortMergeJoin"))

    // partitioned sink prunes by flight_date
    assert(new java.io.File(out, "flight_date=2024-01-01").exists())
    assert(spark.read.parquet(out).filter($"flight_date" === "2024-01-03").count() == 2) // AA Wed + BA
  }

  test("E2: window upsert is idempotent and replaces only the window") {
    val out = Files.createTempDirectory("graft_fp_out2").toString + "/flights"
    val (flights, _) = FlightPipeline.runImport(spark, schedules, airports, out)
    val existing = flights.cache()
    // reload window = Jan 3 (UTC µs bounds covering the whole day)
    val t0 = 1704240000000000L // 2024-01-03 00:00 UTC
    val t1 = 1704326400000000L // 2024-01-04 00:00 UTC
    val incoming = existing.withColumn("totalSeats", $"totalSeats" + 1000)
    val merged = FlightPipeline.upsertWindow(existing, incoming, t0, t1)
    assert(merged.count() == existing.count(), "row count preserved")
    val inWin = merged.filter($"dep_utc_us" >= t0 && $"dep_utc_us" < t1)
    assert(inWin.filter($"totalSeats" < 1000).count() == 0, "window rows replaced")
    val outWin = merged.filter($"dep_utc_us" < t0 || $"dep_utc_us" >= t1)
    assert(outWin.filter($"totalSeats" >= 1000).count() == 0, "outside window untouched")
    // idempotence: applying the same batch again changes nothing
    val again = FlightPipeline.upsertWindow(merged, incoming, t0, t1)
    assert(again.exceptAll(merged).count() == 0 && merged.exceptAll(again).count() == 0)
  }

  test("E2: duplicate natural keys within a batch resolve deterministically") {
    val out = Files.createTempDirectory("graft_fp_out3").toString + "/flights"
    val (flights, _) = FlightPipeline.runImport(spark, schedules, airports, out)
    val existing = flights.cache()
    val t0 = 1704240000000000L
    val t1 = 1704326400000000L
    // two conflicting rows per natural key in the SAME incoming batch:
    // without a full-row tie-break, row_number picks an arbitrary winner
    val incoming = existing.withColumn("totalSeats", $"totalSeats" + 1000)
      .unionByName(existing.withColumn("totalSeats", $"totalSeats" + 2000))
    val runs = (1 to 3).map { _ =>
      FlightPipeline.upsertWindow(existing, incoming, t0, t1)
        .repartition(7) // shuffle-perturb to expose order dependence
        .orderBy(FlightPipeline.naturalKey.map(col): _*)
        .collect().toSeq
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2),
      "upsert winner must not depend on partitioning/run")
  }

  test("E3: geo cross-check accepts true mileage, flags corrupt mileage") {
    val out = Files.createTempDirectory("graft_fp_geo").toString + "/flights"
    val (flights, _) = FlightPipeline.runImport(spark, schedules, airports, out)
    // AA 2475 mi JFK→LAX and BA 3451 mi LHR→JFK are the surveyed values
    val flags = flights.select($"carrier", $"distance_dq_ok")
      .as[(String, Boolean)].collect()
    assert(flags.nonEmpty && flags.forall(_._2),
      s"true mileages must pass: ${flags.filterNot(_._2).mkString(",")}")
    // corrupt the declared mileage → the haversine check flags it
    val corrupt = FlightPipeline.enrich(
      flights.drop("dep_country", "dep_region", "dep_lon", "dep_lat",
          "arr_country", "arr_region", "arr_lon", "arr_lat",
          "computed_km", "distance_dq_ok")
        .withColumn("distanceMiles", lit(100)),
      graft.sources.Sources.readCsv(spark, airports,
        graft.sources.Sources.airportsSchema))
    assert(corrupt.filter(!$"distance_dq_ok").count() == corrupt.count(),
      "a 100-mile JFK-LAX claim must fail the geo check")
  }
}
