package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** User-facing facade — the library API a flirt-consume user switches to.
  * Everything delegates to the operator modules; see README.md for the
  * module map and SCALING.md for the 100 TB design notes. */
object Graft {

  // ---- ingestion (reference E1/E2/E3) ----------------------------------

  /** Read a flight-schedule CSV extract (Innovata-style, explicit schema). */
  def readSchedules(spark: SparkSession, path: String): DataFrame =
    sources.Sources.readCsv(spark, path, sources.Sources.scheduleSchema)

  /** Read an airports dimension CSV. */
  def readAirports(spark: SparkSession, path: String): DataFrame =
    sources.Sources.readCsv(spark, path, sources.Sources.airportsSchema)

  /** Full import: validate → filter → expand → UTC-normalize → enrich →
    * partitioned sink. Returns (flights, rejects). */
  def importSchedules(spark: SparkSession, scheduleCsv: String,
                      airportsCsv: String, outPath: String): (DataFrame, DataFrame) =
    operators.FlightPipeline.runImport(spark, scheduleCsv, airportsCsv, outPath)

  /** Expand recurring schedules (day1..day7 flags, Monday-first) into
    * concrete per-date instances. */
  def expandSchedules(df: DataFrame): DataFrame =
    operators.ScheduleExpand.expand(df, "effectiveDate", "discontinuedDate",
      (1 to 7).map(i => s"day$i"))

  /** Idempotent window reload with upsert semantics. */
  def upsertWindow(existing: DataFrame, incoming: DataFrame,
                   windowStartUs: Long, windowEndUs: Long): DataFrame =
    operators.FlightPipeline.upsertWindow(existing, incoming, windowStartUs, windowEndUs)

  // ---- as-of / skew / co-location --------------------------------------

  /** Most recent strictly-prior `right` event per key (single-shuffle). */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, outCol: String = "asof_ts"): DataFrame =
    operators.AsOfJoin.asOfPrior(left, right, keyCol, tsCol, outCol)

  /** Skew-safe equi-join via deterministic salting. */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, nSalts: Int): DataFrame =
    operators.Scale.saltedJoin(probe, build, probeKey, buildKey, nSalts)

  /** Retrofit the keyless band-join → cell-replicated equi-join optimizer
    * rewrite onto a session (`abs(x − y) <= c` stops planning as a
    * nested loop). Sessions built with GraftExtensions have it already. */
  def enableRangeJoinRewrite(spark: SparkSession): Unit =
    plans.RangeJoinRewrite.install(spark)

  /** Exact per-group weighted median without a full-group sort (two-phase
    * bucket refine; see operators.Quantiles). */
  def weightedMedian(df: DataFrame, group: String, value: String,
                     weight: String, bucketWidth: Long): DataFrame =
    operators.Quantiles.weightedMedian(df, group, value, weight, bucketWidth)

  // ---- training-data pipeline ------------------------------------------

  /** Exact cosine similarity column (codegen'd DotFold). */
  def cosine(a: Column, b: Column): Column = functions.AnnSearch.cosine(a, b)

  /** Brute-force exact top-k neighbors of one query vector. */
  def cosineTopK(embeddings: DataFrame, queryDf: DataFrame, k: Int): DataFrame =
    functions.AnnSearch.cosineTopK(embeddings, queryDf, k)

  /** Approximate top-k via sign-LSH buckets + exact rerank (scale path). */
  def annTopK(embeddings: DataFrame, queryDf: DataFrame, k: Int, dim: Int): DataFrame =
    functions.AnnSearch.annTopK(embeddings, queryDf, k, dim)

  /** MinHash sketch aggregate over a BIGINT element-hash column. */
  def minhash(c: Column, nHashes: Int): Column = plans.MinHashAgg.minhash(c, nHashes)

  /** One-pass 60-bit SimHash signature of a token-array column (codegen'd;
    * no explode, no shuffle). */
  def simhash60(tokens: Column): Column = plans.SimHash60.simhash60(tokens)

  /** Heuristic language ID (pure Catalyst expression). */
  def langId(text: Column): Column = functions.LangId.langId(text)

  /** Overlapping token-window chunking (context-window preparation). */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     window: Int = 20, stride: Int = 10): DataFrame =
    operators.Pipeline.chunkOverlap(docs, idCol, textCol, window, stride)

  /** Deterministic md5-bucket sampling: keep `keepPct`% of rows by key. */
  def sampleCorpus(df: DataFrame, keyCol: String, keepPct: Int): DataFrame =
    operators.Pipeline.sampleByHash(df, keyCol, keepPct)

  /** Redact emails and 3+-digit runs with placeholder tokens. */
  def scrubPii(c: Column): Column = operators.Pipeline.scrubPii(c)

  /** Distinct-token ratio ×1e4 (repetition/boilerplate signal). */
  def repetitionRatioE4(textCol: Column): Column =
    operators.Pipeline.uniqRatioE4(textCol)
}
