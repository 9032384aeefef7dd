package graft.operators

import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's three pipeline entry points (SURVEY §3.1), re-expressed
  * as one declarative Spark job graph:
  *
  *   E1 full import:   CSV extract → validate → passenger filter →
  *                     schedule expansion → UTC normalization →
  *                     airports enrichment → partitioned sink
  *   E2 incremental:   same transform + idempotent delete-insert window
  *                     (Mongo-upsert semantics as pure dataflow)
  *   E3 dim refresh:   airports load (broadcast side)
  *
  * Scale shape: validation/filter/expansion/normalization are all
  * narrow/generated transforms (zero shuffles, whole-stage codegen);
  * enrichment is two broadcast joins (~7k-row airports dim); the only wide
  * stage is the upsert window dedup, one hash shuffle on the natural key.
  * The sink partitions by flight_date, so downstream date-range queries
  * prune at the directory level.
  */
object FlightPipeline {

  /** Natural key of a concrete flight instance (upsert identity). */
  val naturalKey: Seq[String] =
    Seq("carrier", "flightnumber", "departureAirport", "dep_utc_us")

  /** Split into (valid, rejects): required fields present, date range sane,
    * seat counts non-negative. Rejects carry a reason column (the
    * reference's parser/validator stage). */
  def validate(raw: DataFrame): (DataFrame, DataFrame) = {
    val reason = when(col("carrier").isNull || col("flightnumber").isNull, "missing_key")
      .when(col("effectiveDate").isNull || col("discontinuedDate").isNull, "missing_dates")
      .when(col("discontinuedDate") < col("effectiveDate"), "inverted_range")
      .when(col("departureAirport").isNull || col("arrivalAirport").isNull, "missing_airport")
      .when(col("totalSeats") < 0, "negative_seats")
    val tagged = raw.withColumn("__reject_reason", reason)
    (tagged.filter(col("__reject_reason").isNull).drop("__reject_reason"),
      tagged.filter(col("__reject_reason").isNotNull))
  }

  /** Passenger-service filter: at least one seat and a real airport pair
    * (the reference drops freight/positioning rows). */
  def passengerOnly(df: DataFrame): DataFrame =
    df.filter(col("totalSeats") > 0 && col("departureAirport") =!= col("arrivalAirport"))

  /** Expand recurring schedules to per-date instances and normalize local
    * published times + UTC variance to UTC instants (epoch-µs BIGINT):
    * dep_utc = flightDate + departureTimeLocal − variance minutes;
    * arrival additionally honors arrivalDayIndicator (overnight +N days). */
  def expandAndNormalize(df: DataFrame): DataFrame =
    ScheduleExpand.expand(df, "effectiveDate", "discontinuedDate",
        (1 to 7).map(i => s"day$i"), dateCol = "flight_date")
      .withColumn("dep_local_ts",
        to_timestamp(concat(col("flight_date").cast("string"), lit(" "),
          col("departureTimeLocal")), "yyyy-MM-dd HH:mm"))
      .withColumn("arr_local_ts",
        to_timestamp(concat(date_add(col("flight_date"),
            coalesce(col("arrivalDayIndicator"), lit(0))).cast("string"),
          lit(" "), col("arrivalTimeLocal")), "yyyy-MM-dd HH:mm"))
      .withColumn("dep_utc_us",
        unix_micros(col("dep_local_ts")) - col("departureUTCVariance").cast("long") * 60000000L)
      .withColumn("arr_utc_us",
        unix_micros(col("arr_local_ts")) - col("arrivalUTCVariance").cast("long") * 60000000L)
      .withColumn("duration_min",
        ((col("arr_utc_us") - col("dep_utc_us")) / 60000000L).cast("long"))
      .drop("dep_local_ts", "arr_local_ts")

  /** Airports enrichment (E3 consumer): broadcast join on both endpoints,
    * plus a geo cross-check: great-circle km computed from the endpoint
    * coordinates next to the feed's declared mileage, with a DQ flag when
    * they disagree by >10% (a transposed-coordinate or stale-mileage
    * detector — the check the reference's ingest should have had). */
  def enrich(flights: DataFrame, airports: DataFrame): DataFrame = {
    val dep = airports.select(
      col("iata").as("departureAirport"), col("countryCode").as("dep_country"),
      col("globalRegion").as("dep_region"), col("longitude").as("dep_lon"),
      col("latitude").as("dep_lat"))
    val arr = airports.select(
      col("iata").as("arrivalAirport"), col("countryCode").as("arr_country"),
      col("globalRegion").as("arr_region"), col("longitude").as("arr_lon"),
      col("latitude").as("arr_lat"))
    flights
      .join(broadcast(dep), Seq("departureAirport"), "left")
      .join(broadcast(arr), Seq("arrivalAirport"), "left")
      .withColumn("computed_km", graft.functions.Geo.haversineKm(
        col("dep_lat"), col("dep_lon"), col("arr_lat"), col("arr_lon")))
      .withColumn("distance_dq_ok",
        col("computed_km").isNull || col("distanceMiles").isNull ||
        (abs(col("computed_km") * 0.621371 - col("distanceMiles")) <=
          col("distanceMiles") * 0.10 + lit(25.0)))
  }

  /** Mongo-upsert semantics (E2): within the reload window, incoming rows
    * replace existing ones (delete-insert); outside it, existing rows are
    * kept; per natural key the latest batch wins. Pure dataflow — becomes
    * MERGE INTO on an ACID table sink. */
  def upsertWindow(existing: DataFrame, incoming: DataFrame,
                   windowStartUs: Long, windowEndUs: Long): DataFrame = {
    val kept = existing.filter(
      col("dep_utc_us") < windowStartUs || col("dep_utc_us") >= windowEndUs)
    val replacement = incoming.filter(
      col("dep_utc_us") >= windowStartUs && col("dep_utc_us") < windowEndUs)
    // Tie-break beyond __batch: duplicate natural keys WITHIN one side would
    // otherwise pick an arbitrary row_number winner. A full-row hash makes
    // the choice deterministic (identical duplicate rows are interchangeable,
    // distinct ones order by hash — stable across runs and partitionings).
    val union = kept.withColumn("__batch", lit(0))
      .unionByName(replacement.withColumn("__batch", lit(1)))
    val rowHash = xxhash64(union.columns.filterNot(_ == "__batch").sorted.map(col): _*)
    val w = Window.partitionBy(naturalKey.map(col): _*)
      .orderBy(col("__batch").desc, rowHash.asc)
    union
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__batch", "__rn")
  }

  /** E1 end-to-end: returns (instances written, rejects) and writes the
    * partitioned sink. */
  def runImport(spark: SparkSession, scheduleCsv: String, airportsCsv: String,
                outPath: String): (DataFrame, DataFrame) = {
    val raw = Sources.readCsv(spark, scheduleCsv, Sources.scheduleSchema)
    val (valid, rejects) = validate(raw)
    val flights = enrich(
      expandAndNormalize(passengerOnly(valid)),
      Sources.readCsv(spark, airportsCsv, Sources.airportsSchema))
    Sources.writePartitioned(flights, outPath, Seq("flight_date"))
    (flights, rejects)
  }
}
