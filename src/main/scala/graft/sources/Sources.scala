package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** §2-A sources/sinks beyond parquet scans.
  *
  * The reference consumes Innovata/FlightGlobal-style flight-schedule CSV
  * extracts and an airports dimension (see /root/repo/FIXTURES.md; the
  * reference checkout was absent at survey time — SURVEY.md §0). Schemas
  * are always explicit `StructType`s: `inferSchema` is nondeterministic
  * and costs an extra full pass at 100 TB.
  */
object Sources {

  /** The reference's native input: one row per recurring scheduled leg. */
  val scheduleSchema: StructType = StructType(Seq(
    StructField("carrier", StringType),
    StructField("flightnumber", IntegerType),
    StructField("effectiveDate", DateType),
    StructField("discontinuedDate", DateType),
    StructField("day1", BooleanType), StructField("day2", BooleanType),
    StructField("day3", BooleanType), StructField("day4", BooleanType),
    StructField("day5", BooleanType), StructField("day6", BooleanType),
    StructField("day7", BooleanType),
    StructField("departureAirport", StringType),
    StructField("arrivalAirport", StringType),
    StructField("departureTimeLocal", StringType),
    StructField("arrivalTimeLocal", StringType),
    StructField("departureUTCVariance", IntegerType),
    StructField("arrivalUTCVariance", IntegerType),
    StructField("arrivalDayIndicator", IntegerType),
    StructField("stops", IntegerType),
    StructField("firstSeats", IntegerType),
    StructField("businessSeats", IntegerType),
    StructField("economySeats", IntegerType),
    StructField("totalSeats", IntegerType),
    StructField("aircraftType", StringType),
    StructField("distanceMiles", IntegerType)))

  /** Airports dimension (broadcast-joined enrichment table). */
  val airportsSchema: StructType = StructType(Seq(
    StructField("iata", StringType), StructField("name", StringType),
    StructField("city", StringType), StructField("state", StringType),
    StructField("countryCode", StringType), StructField("countryName", StringType),
    StructField("globalRegion", StringType), StructField("wac", IntegerType),
    StructField("longitude", DoubleType), StructField("latitude", DoubleType)))

  /** A2: CSV ingest with explicit schema, header, null and date handling.
    * escape='"' selects RFC 4180 quote-doubling (Spark's default is
    * backslash-escape, which most other CSV consumers cannot parse). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("nullValue", "")
      .option("escape", "\"")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)

  /** A2 sink side: RFC 4180 CSV (header row, `""` quote doubling) so the
    * output is readable by any standard CSV consumer, not just Spark. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  /** A3: JSON-lines ingest with explicit schema. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** A4: partitioned parquet sink. Partition columns become directory keys
    * (→ partition pruning on read); at scale pair with a sensible target
    * file size rather than many tiny files. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.write.partitionBy(partitionCols: _*).mode(mode).parquet(path)

  /** A5: incremental consumption of a landing directory (streaming file
    * source; run with Trigger.AvailableNow for batch-equivalent catch-up). */
  def readStreamDir(spark: SparkSession, dir: String, schema: StructType,
                    format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)
}
