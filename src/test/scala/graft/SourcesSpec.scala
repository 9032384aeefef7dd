package graft

import java.nio.file.Files
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** §2-A2/A3/A4/A5: CSV / JSON-lines ingest, partitioned sink, streaming
  * file source (batch-equivalence under AvailableNow). */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val scheduleCsv =
    """carrier,flightnumber,effectiveDate,discontinuedDate,day1,day2,day3,day4,day5,day6,day7,departureAirport,arrivalAirport,departureTimeLocal,arrivalTimeLocal,departureUTCVariance,arrivalUTCVariance,arrivalDayIndicator,stops,firstSeats,businessSeats,economySeats,totalSeats,aircraftType,distanceMiles
      |AA,100,2024-01-01,2024-01-14,true,false,true,false,true,false,false,JFK,LAX,08:00,11:30,-300,-480,0,0,8,24,130,162,738,2475
      |BA,7,2024-01-01,2024-01-07,true,true,true,true,true,true,true,LHR,JFK,10:00,13:05,0,-300,0,0,14,48,200,262,744,3451
      |ZZ,999,2024-02-01,2024-02-02,false,false,false,false,false,false,false,AAA,BBB,,,0,0,0,1,,,,,,""".stripMargin

  test("A2: CSV ingest with explicit schema, header, nulls, dates") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "schedule.csv")
    Files.writeString(f.toPath, scheduleCsv)
    val df = Sources.readCsv(spark, f.getAbsolutePath, Sources.scheduleSchema)
    assert(df.count() == 3)
    assert(df.schema == Sources.scheduleSchema)
    val aa = df.filter($"carrier" === "AA").head()
    assert(aa.getAs[java.sql.Date]("effectiveDate").toString == "2024-01-01")
    assert(aa.getAs[Boolean]("day1") && !aa.getAs[Boolean]("day2"))
    val zz = df.filter($"carrier" === "ZZ").head()
    assert(zz.isNullAt(zz.fieldIndex("totalSeats")), "empty string -> null int")
    assert(zz.isNullAt(zz.fieldIndex("departureTimeLocal")), "empty string -> null string")
  }

  test("A3: JSON-lines ingest with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "rows.jsonl")
    Files.writeString(f.toPath,
      """{"iata":"JFK","name":"Kennedy","longitude":-73.78,"latitude":40.64,"wac":22}
        |{"iata":"LHR","name":"Heathrow","longitude":-0.45,"latitude":51.47,"wac":496}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("iata", StringType), StructField("name", StringType),
      StructField("longitude", DoubleType), StructField("latitude", DoubleType),
      StructField("wac", IntegerType)))
    val df = Sources.readJsonLines(spark, f.getAbsolutePath, schema)
    assert(df.count() == 2)
    assert(df.filter($"iata" === "JFK").head().getAs[Double]("longitude") == -73.78)
  }

  test("A4: partitioned parquet sink writes directory keys + prunes on read") {
    val out = Files.createTempDirectory("graft_sink").toString + "/part"
    val df = Tables.orders(spark, TestSpark.sfDir)
      .withColumn("status", $"o_orderstatus")
    Sources.writePartitioned(df, out, Seq("status"))
    assert(new java.io.File(out, "status=F").exists())
    val back = spark.read.parquet(out).filter($"status" === "F")
    assert(back.count() == df.filter($"o_orderstatus" === "F").count())
    val scanned = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("status=O"), "partition pruning should skip status=O")
  }

  test("A5: streaming file source == batch result under AvailableNow") {
    val dir = Files.createTempDirectory("graft_stream").toString
    Tables.nation(spark, TestSpark.sfDir).write.mode("overwrite").parquet(dir)
    val schema = Tables.nation(spark, TestSpark.sfDir).schema
    val counted = Sources.readStreamDir(spark, dir, schema)
      .groupBy($"n_regionkey").count()
    val q = counted.writeStream.format("memory").queryName("a5_check")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamRows = spark.table("a5_check").orderBy("n_regionkey")
      .as[(Int, Long)].collect().toSeq
    val batchRows = Tables.nation(spark, TestSpark.sfDir)
      .groupBy($"n_regionkey").count().orderBy("n_regionkey")
      .as[(Int, Long)].collect().toSeq
    assert(streamRows == batchRows)
  }

  test("A7: parquet schema evolution — added columns merge, old rows backfill null") {
    // The 100 TB reality: a long-lived dataset accretes columns; files
    // written before the addition must stay readable with NULL backfill
    // and no rewrite. mergeSchema unions the per-file footers.
    val dir = Files.createTempDirectory("graft_evolve").toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("id", "score", "v"))
    assert(merged.count() == 4)
    val byId = merged.collect().map(r =>
      r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("score"))) None
         else Some(r.getLong(r.fieldIndex("score"))))).toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty, "pre-evolution rows backfill NULL")
    assert(byId(3L).contains(30L) && byId(4L).contains(40L))
    // and filters on the NEW column still prune correctly across old files
    assert(merged.filter($"score" >= 40).count() == 1)
  }

  test("A2/A3 oracle queries: text round-trips preserve quoting, NULLs, nesting") {
    // The oracle-checked form (operators.Ingest): engine-written CSV/JSON
    // re-read by the engine must reproduce the source rows exactly —
    // embedded commas and doubled quotes, empty-field NULL, ISO dates,
    // nested struct/array fields, and JSON keys omitted for NULL.
    val csv = operators.Ingest.queries("ingest_csv_roundtrip")(spark, TestSpark.sfDir).collect()
    assert(csv.length == 25)
    val r7 = csv.find(_.getLong(0) == 7L).get
    assert(r7.getAs[String]("note") == "a,\"q\" NATION_7", "RFC-4180 quote round-trip")
    assert(r7.getAs[String]("d_s") == "1992-01-10")
    assert(r7.getAs[Long]("opt") == 49L)
    assert(csv.find(_.getLong(0) == 3L).get.isNullAt(4), "empty CSV field -> NULL")
    val js = operators.Ingest.queries("ingest_json_roundtrip")(spark, TestSpark.sfDir).collect()
    assert(js.length == 25)
    val j5 = js.find(_.getLong(0) == 5L).get
    assert(j5.getAs[Long]("geo_rk") == 0L && j5.getAs[String]("geo_nm") == "NATION_5")
    assert(j5.getAs[String]("arr_s") == "5,10")
    assert(js.find(_.getLong(0) == 4L).get.isNullAt(5), "absent JSON key -> NULL")
  }

  test("A6: ORC sink/source round-trips data and pushes filters into the scan") {
    // Spark's second first-class columnar format: same writer/reader API,
    // same predicate-pushdown contract as parquet — a deployment can point
    // the engine at ORC lakes without code changes.
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = Tables.customer(spark, TestSpark.sfDir)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    assert(back.schema.map(_.name) == src.schema.map(_.name))
    val filtered = back.filter($"c_nationkey" === 3)
    assert(filtered.count() ==
      src.filter($"c_nationkey" === 3).count())
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_nationkey)"),
      s"ORC scan must push predicates:\n${plan.take(600)}")
  }
}
