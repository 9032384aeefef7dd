package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The engine-wide contract behind every time-domain oracle: `events.ts`
  * surfaces as BIGINT epoch-ns no matter which physical encoding the
  * testdata generator shipped. Round 4 broke on exactly this — the driver
  * regenerated events.ts as TIMESTAMP(MICROS/NTZ) where rounds 1–3 had
  * TIMESTAMP(NANOS): 26 batch queries threw DATATYPE_MISMATCH and the
  * streaming source silently read raw micros as nanos. This spec writes
  * the same rows under each encoding Spark can produce and pins batch
  * (Tables.events) and streaming (Streams.readEvents) to identical ns.
  */
class EventsSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Known instants, expressed in epoch-µs (all encodings can carry these
  // exactly; the ns contract value is µs × 1000).
  private val us = Seq(1704067200000000L, 1704067201500000L, 1706657176220708L)
  private val expectedNs = us.map(_ * 1000L)

  private def writeVariant(encode: String): String = {
    val dir = Files.createTempDirectory(s"graft_events_$encode").toString
    val base = us.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, i.toLong % 2, "click", 1.5 + i, s"""{"k": $i}""")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val withTs = encode match {
      // rounds 1–3 under nanosAsLong: the NANOS column surfaces as a long
      case "long_ns" => base.withColumn("ts", $"ts_us" * 1000L)
      // round-4 driver data: TIMESTAMP(MICROS), isAdjustedToUTC=false.
      // timestamp→NTZ cast takes the session-tz wall clock; the suite
      // session is UTC, so the stored micros equal ts_us exactly.
      case "ntz_us" =>
        base.withColumn("ts", timestamp_micros($"ts_us").cast(TimestampNTZType))
      // the third encoding a producer could ship: UTC-adjusted MICROS
      case "tz_us" => base.withColumn("ts", timestamp_micros($"ts_us"))
    }
    withTs
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    // The driver ships events.parquet as a single FILE (the streaming
    // source's pathGlobFilter matches file names) — mirror that layout.
    val part = new java.io.File(s"$dir/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private def batchNs(dir: String): Seq[Long] =
    Tables.events(spark, dir).orderBy("event_id")
      .select("ts").as[Long].collect().toSeq

  private def streamNs(dir: String): Seq[Long] = {
    val name = s"graft_events_schema_${dir.hashCode.abs}"
    val q = streaming.Streams.readEvents(spark, dir)
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).orderBy("event_id").select("ts").as[Long].collect().toSeq
  }

  for (enc <- Seq("long_ns", "ntz_us", "tz_us")) {
    test(s"batch Tables.events normalizes $enc to BIGINT epoch-ns") {
      val dir = writeVariant(enc)
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == LongType,
        s"$enc must surface ts as LongType")
      assert(batchNs(dir) == expectedNs)
      // column position is part of the contract (SELECT * shapes)
      assert(df.columns.toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    }

    test(s"streaming readEvents agrees with batch for $enc") {
      val dir = writeVariant(enc)
      assert(streamNs(dir) == expectedNs)
    }
  }
}
