package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.PlanShim
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Spark SQL surface for [[VersionedTable]]: `spark.read.format("graftvt")`,
  * `df.write.format("graftvt")`, and `CREATE [TEMPORARY] VIEW/TABLE ...
  * USING graftvt` — the difference between a Scala library and an engine
  * feature (anything that speaks Spark SQL or the DataFrame reader/writer
  * can now read a versioned snapshot or commit a new version, no
  * `VersionedTable.*` call in sight).
  *
  * Options (mirroring Delta's reader options; each maps 1:1 onto the
  * library read path, so the SQL surface can never drift from it):
  *   - `path`            table root (or pass to `.load(path)`)
  *   - `versionAsOf`     snapshot version to read (default: latest)
  *   - `timestampAsOf`   resolve the greatest version with commit
  *                       ts ≤ this value ([[VersionedTable.versionAsOf]]);
  *                       mutually exclusive with `versionAsOf`
  *   - `mergeSchema`     surface columns added by later commits, older
  *                       rows reading null (default false)
  *   - `partitions`      comma-separated partition values — manifest-level
  *                       pruning before any storage I/O
  *   - `readChangeFeed`  with `startingVersion`/`endingVersion`: the
  *                       row-level diff of a commit range (Delta's
  *                       table_changes) instead of a snapshot
  *   - `history`         commit metadata as a relation (DESCRIBE HISTORY)
  *
  * Architecture: a V1 `RelationProvider` over the library read path — the
  * pattern Delta itself ships for `format("delta")` batch reads. The
  * relation resolves the snapshot ONCE at creation (so a SQL view pins its
  * version exactly like a pinned `read()` — snapshot isolation carries
  * over), and `buildScan` re-applies Spark's pushed projection and
  * filters to the inner DataFrame, where Catalyst pushes them into the
  * manifest-listed parquet scan — column pruning and predicate pushdown
  * survive the V1 boundary. `unhandledFilters` keeps every filter (the
  * default), so Spark re-evaluates them above the scan: the translation
  * below is a scan-pruning hint, never a correctness dependency.
  *
  * Catalog integration (the full SQL DDL/DML surface, all V1-native):
  *   - `CREATE TABLE t USING graftvt OPTIONS (path, partitionCol)` — a
  *     persistent session-catalog table over an existing log; with
  *     `AS SELECT` (CTAS) the statement routes to `create` (version 0);
  *   - `INSERT INTO` / `INSERT OVERWRITE t` — [[GraftVtRelation.insert]]
  *     (InsertableRelation) maps them to appendCommit / overwriteCommit,
  *     one versioned commit per statement;
  *   - `MERGE INTO t USING s ...` — [[GraftVtMergeRule]] (injected via
  *     GraftExtensions) rewrites the resolved statement into a
  *     mergeCommit, Delta's analyzer-extension architecture;
  *   - `UPDATE t SET ... WHERE ...` / `DELETE FROM t [WHERE ...]` —
  *     [[GraftVtDmlRule]] routes them to partition-scoped COW rewrites
  *     (and whole-partition DELETE to a metadata-only partition drop);
  *   - `OPTIMIZE t [ZORDER BY (a, b)]`, `VACUUM t [RETAIN n VERSIONS]
  *     [GRACE n HOURS]`, `DESCRIBE HISTORY t` — [[GraftSqlParser]], a
  *     delegating parser for the maintenance verbs Spark's grammar lacks;
  *   - `SELECT ... FROM t VERSION|TIMESTAMP AS OF ...` — native time
  *     travel, resolved to the same pinned relation as the `versionAsOf` /
  *     `timestampAsOf` options ([[GraftVtTimeTravelRule]]).
  * A DSv2 `TableProvider` would change none of these semantics — Spark's
  * own DataFrameReader/Writer fall back to exactly this V1 surface for
  * tables that don't claim BATCH_READ/BATCH_WRITE capabilities, and the
  * row-level-operation API would re-implement the commit protocol the
  * library already owns.
  */
final class GraftVtSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graftvt"

  /** Streaming write surface: `df.writeStream.format("graftvt")
    * .option("partitionCol", c).start(path)` — each microbatch lands as
    * one appendCommit (the first creates the table), stamped with the
    * batch id so a REPLAYED microbatch after a crash-restart is skipped:
    * exactly-once streaming ingest into the versioned table, the Delta
    * transactional-sink (`txnAppId`/`txnVersion`) pattern carried in
    * commit op metadata ([[VersionedTable.txnOp]]/[[VersionedTable.lastTxn]]).
    * Options: `partitionCol` (required), `txnAppId` (idempotence scope —
    * set it per logical pipeline when several queries feed one table;
    * defaults to a single shared scope), `statsCol`, `fileSplits`. Only
    * OutputMode.Append is meaningful: each batch is new rows; a
    * complete/update stream needs merge semantics (see stream_cdc_apply's
    * MergeSink for that shape). */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graftvt sink: 'path' option (or start(path)) is required"))
    val partitionCol = parameters.get("partitionCol")
      .orElse(partitionColumns.headOption)
      .getOrElse(throw new IllegalArgumentException(
        "graftvt sink: 'partitionCol' option (or partitionBy) is required"))
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graftvt sink supports OutputMode.Append only, got $outputMode")
    new GraftVtSink(sqlContext.sparkSession, path, partitionCol,
      parameters.get("statsCol"),
      parameters.get("fileSplits").map(_.trim.toInt).getOrElse(1),
      parameters.getOrElse("txnAppId", "graftvt-stream"))
  }

  /** Streaming read surface: `spark.readStream.format("graftvt")
    * .option("startingVersion", v).load(path)` — the table's commit log
    * consumed as a CHANGE DATA FEED stream, Delta-source style: each
    * committed version is one ordered unit of the stream, delivered as its
    * row-level diff (`_commit_version`, `_change_type` + table columns via
    * [[VersionedTable.changes]]). Offsets are commit versions, so the
    * stream is exactly-once replayable from the checkpoint: a restarted
    * query re-derives precisely the committed version range it was handed
    * before (the diff of an immutable committed version never changes).
    * Options:
    *   - `startingVersion`  first version to emit (default 0 = full
    *                        history: the initial snapshot arrives as v0's
    *                        inserts, like Delta CDF's startingVersion=0);
    *                        `latest` = only commits after stream start
    *   - `startingTimestamp`  first version whose commit ts ≥ this value
    *                        (mutually exclusive with startingVersion;
    *                        commits without a recorded ts never match)
    *   - `maxVersionsPerTrigger`  admission cap per microbatch (rate
    *                        limiting; AvailableNow still drains to the
    *                        stream-start snapshot through Spark's
    *                        AvailableNowSourceWrapper) */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    checkStreamOptions(parameters)
    (shortName(), GraftVtStreamSource.cdfSchema(
      sqlContext.sparkSession, streamPath(parameters)))
  }

  private def checkStreamOptions(parameters: Map[String, String]): Unit =
    require(
      !(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "graftvt stream: startingVersion and startingTimestamp are mutually exclusive")

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = streamPath(parameters)
    checkStreamOptions(parameters)
    val starting = parameters.get("startingVersion").map(_.trim) match {
      case Some("latest") => VersionedTable.latestVersion(spark, path) + 1
      case Some(v)        => v.toInt
      case None           =>
        // Delta parity: first version whose commit ts is AT OR AFTER the
        // given timestamp (the CDF convention — a reader asking "changes
        // since t" must not re-see the snapshot committed before t)
        parameters.get("startingTimestamp").map(_.trim.toLong) match {
          case Some(t) =>
            val hist = VersionedTable.history(spark, path)
              .select(col("version"), col("ts")).collect()
              .collect { case r if !r.isNullAt(1) && r.getLong(1) >= t =>
                r.getInt(0) }
            if (hist.isEmpty) VersionedTable.latestVersion(spark, path) + 1
            else hist.min
          case None => 0
        }
    }
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.trim.toInt)
    maxVersions.foreach(m => require(m > 0,
      s"graftvt: maxVersionsPerTrigger must be positive, got $m"))
    new GraftVtStreamSource(spark, path, starting, maxVersions)
  }

  private def streamPath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftvt stream: 'path' option (or load(path)) is required"))

  /** Write path: `df.write.format("graftvt").option("partitionCol", c)
    * .mode(m).save(path)` — each SaveMode maps onto exactly one commit
    * primitive, so the DataFrame writer surface can never drift from the
    * library's transaction semantics:
    *   - ErrorIfExists → `create` (version 0; fails on an existing log)
    *   - Append        → `appendCommit` (blind adds-only commit; creates
    *                     the table when no log exists yet, Delta-style)
    *   - Overwrite     → `overwriteCommit` (whole-table replace as ONE
    *                     atomic version; history stays time-travelable)
    *   - Ignore        → no-op when a log exists, else `create`
    * Extra options: `statsCol` (per-file min/max column metrics recorded
    * in the manifest), `ts` (commit metadata timestamp), `fileSplits`
    * (hot-partition write salting). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftvt write: 'path' is required"))
    val partitionCol = parameters.getOrElse("partitionCol",
      throw new IllegalArgumentException(
        "graftvt write: 'partitionCol' option is required"))
    val statsCol = parameters.get("statsCol")
    val ts = parameters.get("ts").map(_.trim.toLong)
    val fileSplits = parameters.get("fileSplits").map(_.trim.toInt).getOrElse(1)
    val exists = VersionedTable.latestVersion(spark, path) >= 0
    mode match {
      case SaveMode.ErrorIfExists =>
        VersionedTable.create(spark, path, data, partitionCol, statsCol, ts,
          fileSplits)
      case SaveMode.Append =>
        if (exists)
          VersionedTable.appendCommit(spark, path, data, partitionCol,
            statsCol, ts, fileSplits)
        else
          VersionedTable.create(spark, path, data, partitionCol, statsCol,
            ts, fileSplits)
      case SaveMode.Overwrite =>
        if (exists)
          VersionedTable.overwriteCommit(spark, path, data, partitionCol,
            statsCol, ts, fileSplits)
        else
          VersionedTable.create(spark, path, data, partitionCol, statsCol,
            ts, fileSplits)
      case SaveMode.Ignore =>
        if (!exists)
          VersionedTable.create(spark, path, data, partitionCol, statsCol,
            ts, fileSplits)
    }
    createRelation(sqlContext, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graftvt: 'path' option (or load(path)) is required"))
    require(
      !(parameters.contains("versionAsOf") &&
        parameters.contains("timestampAsOf")),
      "graftvt: versionAsOf and timestampAsOf are mutually exclusive")
    if (parameters.get("history").exists(_.trim.toBoolean))
      // commit metadata as a relation (DESCRIBE HISTORY): version, ts,
      // operation, file-op counts, row-count deltas — all from the log
      return new GraftVtCdfRelation(sqlContext,
        VersionedTable.history(spark, path))
    if (parameters.get("readChangeFeed").exists(_.trim.toBoolean)) {
      // batch CDF (Delta's table_changes): the row-level diff of a commit
      // range as a queryable relation — `_commit_version`, `_change_type`
      // + table columns, straight off VersionedTable.changes
      val from = parameters.get("startingVersion").map { s =>
        // `latest` is a STREAM-path option; the batch CDF range must be an
        // explicit integer (Delta's table_changes contract) — fail with a
        // graftvt-prefixed message, not a raw NumberFormatException
        scala.util.Try(s.trim.toInt).getOrElse(throw new IllegalArgumentException(
          s"graftvt: batch readChangeFeed startingVersion must be an integer, got '$s'"))
      }.getOrElse(0)
      val to = parameters.get("endingVersion").map { s =>
        scala.util.Try(s.trim.toInt).getOrElse(throw new IllegalArgumentException(
          s"graftvt: batch readChangeFeed endingVersion must be an integer, got '$s'"))
      }.getOrElse(VersionedTable.latestVersion(spark, path))
      require(to >= from,
        s"graftvt: endingVersion $to precedes startingVersion $from")
      return new GraftVtCdfRelation(sqlContext,
        VersionedTable.changes(spark, path, from, to))
    }
    val version = parameters.get("versionAsOf").map(_.trim.toInt)
      .orElse(parameters.get("timestampAsOf").map(t =>
        VersionedTable.versionAsOf(spark, path, t.trim.toLong)))
      .getOrElse(VersionedTable.latestVersion(spark, path))
    require(version >= 0, s"graftvt: $path has no committed version")
    val mergeSchema = parameters.get("mergeSchema").exists(_.trim.toBoolean)
    val partValues = parameters.get("partitions")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    new GraftVtRelation(sqlContext, path, version, partValues, mergeSchema,
      parameters)
  }
}

/** Metadata-derived relation (batch CDF, history): the frame is computed
  * once at relation creation (a pinned, immutable log slice), scanned
  * as-is. */
private final class GraftVtCdfRelation(override val sqlContext: SQLContext,
                                       feed: DataFrame)
    extends BaseRelation with TableScan {
  override def schema: StructType = feed.schema
  override def buildScan(): RDD[Row] = feed.rdd
}

private[graft] final class GraftVtRelation(override val sqlContext: SQLContext,
                                            val path: String, initialVersion: Int,
                                            partValues: Option[Set[String]],
                                            mergeSchema: Boolean,
                                            val tableParameters: Map[String, String])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private val spark = sqlContext.sparkSession

  /** The pinned snapshot version. `@volatile var`, not `val`: a SQL view
    * still pins (nothing re-assigns it on the read path), but an INSERT
    * INTO through THIS relation instance advances it — the session catalog
    * caches one LogicalRelation per table, so without the bump a
    * SELECT-after-INSERT in the same session would keep reading the
    * pre-insert snapshot (V1 JDBC relations are stateless and dodge this;
    * a pinned-version relation must refresh itself). */
  @volatile private var version: Int = initialVersion

  @volatile private var snapshot: DataFrame =
    VersionedTable.read(spark, path, version, partValues, mergeSchema)

  def pinnedVersion: Int = version

  override val schema: StructType = snapshot.schema

  /** Columns the manifest records per-file min/max for — the declared
    * stats column plus any z-order (`mstats`) columns: only predicates on
    * these can prune files. Derived from the scan's own live-entry
    * resolution (one log replay per buildScan, shared with partition
    * pruning and the read itself). */
  private def statsColsOf(entries: Seq[VersionedTable.LogEntry]): Set[String] =
    entries.iterator.flatMap(_.statRanges.keys).toSet

  /** `INSERT INTO` / `INSERT OVERWRITE` on a catalog `graftvt` table —
    * Spark's InsertIntoDataSourceCommand routes here. Each statement is
    * one versioned commit (appendCommit / overwriteCommit), exactly the
    * DataFrame-writer SaveMode mapping, so the SQL DML surface cannot
    * drift from the library's transaction semantics. Columns arrive
    * BY POSITION (PreprocessTableInsertion has already aligned arity and
    * types to this relation's schema) — renamed to the table's field
    * names before the commit, which partitions by name. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    GraftVtDml.requireMutable(this,
      if (overwrite) "INSERT OVERWRITE" else "INSERT")
    val partitionCol = tableParameters.getOrElse("partitionCol",
      throw new IllegalArgumentException(
        "graftvt insert: table must declare a 'partitionCol' option"))
    val named = data.toDF(schema.fieldNames.toSeq: _*)
    val statsCol = tableParameters.get("statsCol")
    val fileSplits = tableParameters.get("fileSplits").map(_.trim.toInt).getOrElse(1)
    if (overwrite)
      VersionedTable.overwriteCommit(spark, path, named, partitionCol,
        statsCol, ts = None, fileSplits = fileSplits)
    else
      VersionedTable.appendCommit(spark, path, named, partitionCol,
        statsCol, ts = None, fileSplits = fileSplits)
    refreshSnapshot()
  }

  /** Re-pin to the latest committed version (after a write through this
    * relation, or an external commit — [[GraftVtMergeCommand]] calls it). */
  private[graft] def refreshSnapshot(): Unit = {
    version = VersionedTable.latestVersion(spark, path)
    snapshot = VersionedTable.read(spark, path, version, partValues, mergeSchema)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    // ONE log replay serves this whole scan: stats-column discovery, the
    // partition prune, and the pruned read all share `entries` (three
    // separate replays would triple the per-query metadata cost of a
    // long-lived table). Resolved lazily — a filterless scan reuses the
    // cached snapshot and replays nothing.
    // replayEntries, not liveEntries: the shared set must carry any
    // schema-evolution entries so the pruned re-read keeps the widened
    // schema (evolve rows are inert for pruning — empty part key, no file)
    lazy val entries = VersionedTable.replayEntries(spark, path, version)
    // manifest-level file skipping: conjunctive bounds over the stats
    // column(s) decide the file list FROM THE LOG before any storage I/O —
    // the filters are still re-applied below (and by Spark above), so the
    // pruning is a strict scan optimization
    val bounds =
      if (filters.isEmpty) Map.empty[String, (Long, Long)]
      else GraftVtRelation.statsBounds(filters, statsColsOf(entries))
    // PARTITION pruning from the same pushed filters (Delta's behavior —
    // a plain `WHERE pmonth = 'x'` must not list the other partitions'
    // files at 100 TB): equality/IN predicates on the table's declared
    // partition column(s) reduce the live-entry set by each entry's
    // recorded part key. Value rendering is restricted to types whose
    // toString provably matches the directory-name rendering (see
    // partFilterValues); anything else contributes nothing — pruning
    // stays a strict optimization.
    val pCols = tableParameters.get("partitionCol")
      .map(VersionedTable.partColsOf).getOrElse(Nil)
    val allowed = GraftVtRelation.partFilterValues(filters,
      pCols.map(_.toLowerCase).toSet)
    val prunedParts: Option[Set[String]] =
      if (allowed.isEmpty) partValues
      else {
        val keep = entries
          .iterator.filter(_.action != "evolve").map(_.part).filter { p =>
            val vals = VersionedTable.partValuesOf(pCols, p)
              .map { case (c, v) => c.toLowerCase -> v }
            allowed.forall { case (c, set) =>
              vals.get(c).forall(set.contains) }
          }.toSet
        Some(partValues.fold(keep)(_ intersect keep))
      }
    val base =
      if (bounds.isEmpty && prunedParts == partValues) snapshot
      else VersionedTable.read(spark, path, version, prunedParts, mergeSchema,
        bounds, preEntries = Some(entries))
    val filtered = filters.flatMap(toColumn)
      .foldLeft(base)((df, c) => df.filter(c))
    val projected =
      if (requiredColumns.isEmpty)
        // COUNT(*)-style scan: no columns requested, only row multiplicity
        filtered.select()
      else filtered.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }

  /** Best-effort translation of Spark's source filters back to Columns so
    * the INNER plan's parquet scan can push them down; anything exotic is
    * simply not forwarded (Spark re-applies all filters above — see
    * `unhandledFilters` default). */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === v)
    case EqualNullSafe(a, v)      => Some(col(a) <=> v)
    case GreaterThan(a, v)        => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v)           => Some(col(a) < v)
    case LessThanOrEqual(a, v)    => Some(col(a) <= v)
    case In(a, vs)                => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c)                   => toColumn(c).map(!_)
    case _                        => None
  }
}

private[graft] object GraftVtRelation {

  /** Partition-column types whose write-side rendering (cast to string →
    * directory name) provably roundtrips through a cast back — the ONE
    * definition both pruning-side consumers share: `partFilterValues`'
    * literal rendering below (its boxed-class match mirrors this set) and
    * the metadata-only DELETE path ([[GraftVtDeleteCommand]]), which may
    * only evaluate a predicate on re-typed partition values when the
    * types are in this set. Extending one consumer without the other
    * would silently mis-prune or drop the wrong partitions. */
  private[sources] val partRenderSafeTypes
      : Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(StringType, BooleanType, ByteType, ShortType, IntegerType,
      LongType, DateType)
  }

  /** Allowed-value set per (lower-cased) PARTITION column, derived from
    * the pushed filter conjunction — the partition-pruning dual of
    * [[statsBounds]]. Soundness: only null-rejecting equality shapes
    * contribute (EqualTo / non-null EqualNullSafe / all-non-null In; a
    * partition value is never null by commit-time contract anyway), and
    * only for literal types whose `toString` provably equals Spark's
    * partition-directory rendering (string, boolean, integral, date) —
    * float/decimal/timestamp renderings can diverge from the dir name, so
    * they contribute NOTHING and pruning stays conservative. An
    * un-understood filter contributes nothing; columns absent from the
    * result impose no constraint. */
  private[graft] def partFilterValues(filters: Array[Filter],
                                      pColsLower: Set[String])
      : Map[String, Set[String]] = {
    if (pColsLower.isEmpty) return Map.empty
    def render(v: Any): Option[String] = v match {
      case null => None
      case _: String | _: java.lang.Boolean | _: java.lang.Byte |
           _: java.lang.Short | _: java.lang.Integer | _: java.lang.Long |
           _: java.sql.Date | _: java.time.LocalDate =>
        Some(v.toString)
      case _ => None
    }
    def valuesOf(f: Filter): Option[(String, Set[String])] = f match {
      case EqualTo(a, v) if pColsLower(a.toLowerCase) =>
        render(v).map(s => a.toLowerCase -> Set(s))
      case EqualNullSafe(a, v) if pColsLower(a.toLowerCase) && v != null =>
        render(v).map(s => a.toLowerCase -> Set(s))
      case In(a, vs) if pColsLower(a.toLowerCase) && vs.nonEmpty =>
        val rs = vs.flatMap(render(_))
        if (rs.length == vs.length) Some(a.toLowerCase -> rs.toSet) else None
      case And(l, r) =>
        (valuesOf(l), valuesOf(r)) match {
          case (Some((a, s1)), Some((b, s2))) if a == b =>
            Some(a -> (s1 intersect s2))
          case (one @ Some(_), _) => one
          case (None, other)      => other
        }
      case Or(l, r) =>
        for {
          (a, s1) <- valuesOf(l)
          (b, s2) <- valuesOf(r) if a == b
        } yield a -> (s1 union s2)
      case _ => None
    }
    filters.iterator.flatMap(valuesOf(_))
      .foldLeft(Map.empty[String, Set[String]]) {
        case (acc, (c, s)) =>
          acc.updated(c, acc.get(c).fold(s)(_ intersect s))
      }
  }

  /** Inclusive [lo, hi] bound per stats column, derived from the pushed
    * filter conjunction. Safety rests on two facts: (1) the manifest's
    * min/max are the file's values CAST AS LONG, and that cast (truncation
    * toward zero) is MONOTONE — so for any row value x and predicate bound
    * v, x ≥ v implies trunc(x) ≥ trunc(v) and likewise for ≤, meaning
    * trunc(v) itself is a safe bound on the truncated stats for >, ≥, <,
    * ≤ and = alike (no ±1 adjustments, no overflow); (2) only
    * null-rejecting predicate shapes contribute (no IsNull/EqualNullSafe),
    * since a skipped file's NULL rows — invisible to min/max — would
    * otherwise be lost. Anything not understood contributes nothing:
    * absent bounds mean "keep every file". Top-level filters are conjuncts
    * (Spark's contract), so per-column bounds intersect; a disjunction
    * contributes its children's hull, and only when both children bound
    * the SAME column. */
  private[graft] def statsBounds(filters: Array[Filter],
                                 statsCols: Set[String])
      : Map[String, (Long, Long)] = {
    if (statsCols.isEmpty) return Map.empty
    filters.iterator.flatMap(boundsOf(_, statsCols))
      .foldLeft(Map.empty[String, (Long, Long)]) {
        case (acc, (c, (lo, hi))) =>
          val (alo, ahi) = acc.getOrElse(c, (Long.MinValue, Long.MaxValue))
          acc.updated(c, (math.max(alo, lo), math.min(ahi, hi)))
      }
  }

  /** Long image of a pushed literal, or None when no SAFE image exists.
    * The soundness argument (monotone truncation, see statsBounds) only
    * holds for finite, long-representable values: a NaN literal under
    * Spark's NaN-greatest ordering satisfies `col < NaN` for every non-NaN
    * row, so truncating it to 0 would prune files that match; a BigDecimal
    * past ±2^63 would WRAP under longValue (JLS narrowing), producing an
    * arbitrary bound. Both return None — pruning stays conservative (keep
    * every file) for literals the Long domain can't represent. */
  private def longOf(v: Any): Option[Long] = v match {
    case n: Byte    => Some(n.toLong)
    case n: Short   => Some(n.toLong)
    case n: Int     => Some(n.toLong)
    case n: Long    => Some(n)
    case n: Float   => if (n.isNaN || n.isInfinite) None else Some(n.toLong)
    case n: Double  => if (n.isNaN || n.isInfinite) None else Some(n.toLong)
    case n: java.math.BigDecimal =>
      scala.util.Try(n.toBigInteger.longValueExact()).toOption
    case n: BigDecimal =>
      scala.util.Try(n.toBigInt.bigInteger.longValueExact()).toOption
    case _          => None
  }

  /** Bounds contributed by ONE filter (conjunct), or None. */
  private def boundsOf(f: Filter, statsCols: Set[String])
      : Option[(String, (Long, Long))] = f match {
    case EqualTo(a, v) if statsCols(a) =>
      longOf(v).map(x => a -> (x, x))
    case GreaterThan(a, v) if statsCols(a) =>
      longOf(v).map(x => a -> (x, Long.MaxValue))
    case GreaterThanOrEqual(a, v) if statsCols(a) =>
      longOf(v).map(x => a -> (x, Long.MaxValue))
    case LessThan(a, v) if statsCols(a) =>
      longOf(v).map(x => a -> (Long.MinValue, x))
    case LessThanOrEqual(a, v) if statsCols(a) =>
      longOf(v).map(x => a -> (Long.MinValue, x))
    case In(a, vs) if statsCols(a) && vs.nonEmpty =>
      val ls = vs.flatMap(longOf)
      if (ls.length == vs.length) Some(a -> (ls.min, ls.max)) else None
    case And(l, r) =>
      // both sides are additional constraints: intersect what we learn
      (boundsOf(l, statsCols), boundsOf(r, statsCols)) match {
        case (Some((a, (l1, h1))), Some((b, (l2, h2)))) if a == b =>
          Some(a -> (math.max(l1, l2), math.min(h1, h2)))
        // different columns: either side alone is a valid (weaker) bound
        case (one @ Some(_), _) => one
        case (None, other)      => other
      }
    case Or(l, r) =>
      // either side may hold: the hull, and only for a shared column
      for {
        (a, (l1, h1)) <- boundsOf(l, statsCols)
        (b, (l2, h2)) <- boundsOf(r, statsCols) if a == b
      } yield a -> (math.min(l1, l2), math.max(h1, h2))
    case _ => None
  }
}

/** V1 [[org.apache.spark.sql.execution.streaming.Sink]]: one versioned
  * commit per microbatch. Exactly-once mechanics:
  *   - the incoming frame is bound to the query's IncrementalExecution and
  *     can't be re-planned by a batch writer — re-wrapped via
  *     [[PlanShim.executedBatch]] (ForeachBatchSink's own recipe);
  *   - every commit's op metadata carries `(txnAppId, batchId)`; addBatch
  *     consults the max committed batch id ONCE per (re)start (one
  *     metadata-bounded log read, then a driver-side counter — streaming
  *     guarantees a single active query per checkpoint) and skips batches
  *     at or below it, so a microbatch replayed after a crash between
  *     commit and checkpoint-advance lands exactly once. */
private final class GraftVtSink(spark: SparkSession, path: String,
                                partitionCol: String, statsCol: Option[String],
                                fileSplits: Int, appId: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  private var committedThrough: Option[Long] = None

  override def addBatch(batchId: Long, data: DataFrame): Unit = synchronized {
    val watermark = committedThrough.getOrElse {
      val w = VersionedTable.lastTxn(spark, path, appId)
      committedThrough = Some(w)
      w
    }
    if (batchId <= watermark) return
    val batch = PlanShim.executedBatch(spark, data)
    if (VersionedTable.latestVersion(spark, path) < 0)
      VersionedTable.create(spark, path, batch, partitionCol, statsCol,
        ts = None, fileSplits = fileSplits,
        opName = VersionedTable.txnOp("create", appId, batchId))
    else
      VersionedTable.appendCommit(spark, path, batch, partitionCol, statsCol,
        ts = None, fileSplits = fileSplits,
        opName = VersionedTable.txnOp("append", appId, batchId))
    committedThrough = Some(batchId)
  }

  override def toString: String = s"GraftVtSink[$path]"
}

private object GraftVtStreamSource {
  /** Stream schema, fixed at source creation (Delta pins the stream to the
    * snapshot schema at start the same way): CDF metadata columns + the
    * table's union schema as of the latest committed version. */
  def cdfSchema(spark: SparkSession, path: String): StructType = {
    val latest = VersionedTable.latestVersion(spark, path)
    require(latest >= 0,
      s"graftvt stream: $path has no committed version to derive a schema from")
    val table = VersionedTable
      .read(spark, path, latest, None, mergeSchema = true).schema
    StructType(
      StructField("_commit_version", IntegerType, nullable = false) +:
      StructField("_change_type", StringType, nullable = false) +:
      table.fields.toSeq)
  }
}

/** V1 [[Source]] over the commit log. An offset is the HIGHEST version
  * delivered so far (LongOffset), so `getBatch(Some(a), b)` is the diff of
  * versions a+1..b — a contiguous, immutable slice of the log, which makes
  * recovery trivial: replaying any (a, b] re-reads identical rows.
  * `getOffset` advances at most `maxVersionsPerTrigger` versions past the
  * last batch handed out; Spark persists the returned offset to the
  * checkpoint's offset log BEFORE calling getBatch (WAL-then-process), the
  * same contract FileStreamSource runs under. */
private final class GraftVtStreamSource(spark: SparkSession, path: String,
                                        startingVersion: Int,
                                        maxVersionsPerTrigger: Option[Int])
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit}

  override val schema: StructType = GraftVtStreamSource.cdfSchema(spark, path)

  /** Highest version already handed out in a getBatch `end` (or restored
    * from the checkpoint via the first getBatch after restart); rate
    * limiting is measured from here. Driver-side only, like every V1
    * source's admission state. */
  @volatile private var lastEnd: Long = startingVersion - 1L

  /** End-of-stream fence for Trigger.AvailableNow: versions committed
    * AFTER the trigger fires belong to the next run. Implementing
    * [[org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow]]
    * directly (FileStreamSource's pattern) keeps `maxVersionsPerTrigger`
    * effective under AvailableNow — the generic AvailableNowSourceWrapper
    * would otherwise capture a rate-capped `getOffset` as the fence and
    * stop the drain one version in. */
  @volatile private var availableAtPrepare: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableAtPrepare = Some(VersionedTable.latestVersion(spark, path).toLong)

  /** Offsets round-trip through the checkpoint as raw JSON
    * (SerializedOffset), so parse from `json` rather than pattern-matching
    * on LongOffset alone. */
  private def versionOf(o: OffsetV2): Long = o match {
    case lo: LongOffset => lo.offset
    case other          => other.json.trim.toLong
  }

  /** Next end offset from a position floor: advance to the latest
    * committed version, capped by `maxVersionsPerTrigger` and the
    * AvailableNow fence, never regressing below the floor. When nothing is
    * new this returns the floor ITSELF — deliberately an offset, not
    * null/None, so the stream's POSITION is checkpointed even before any
    * data flows (a `startingVersion=latest` stream that restarts before
    * its first commit must not re-resolve "latest" and skip the versions
    * committed in between; the one empty batch this costs is the same
    * artifact FileStreamSource exhibits). */
  private def nextEnd(floor: Long): Long = {
    val latestNow = VersionedTable.latestVersion(spark, path).toLong
    val latest = availableAtPrepare.fold(latestNow)(math.min(latestNow, _))
    val capped = maxVersionsPerTrigger
      .fold(latest)(m => math.min(latest, floor + m))
    math.max(capped, floor)
  }

  /** Admission control (the path MicroBatchExecution actually drives for a
    * SupportsAdmissionControl source): the floor is the last PROCESSED
    * offset when the checkpoint has one — `startingVersion` only seeds the
    * very first batch. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 =
    LongOffset(nextEnd(Option(startOffset).map(versionOf)
      .getOrElse(startingVersion - 1L)))

  override def getOffset: Option[OffsetV1] =
    Some(LongOffset(nextEnd(math.max(lastEnd, startingVersion - 1L))))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(versionOf(_) + 1L).getOrElse(startingVersion.toLong)
    val to = versionOf(end)
    lastEnd = math.max(lastEnd, to)
    val batch =
      if (from > to)
        // replayed empty range (possible on restart edge): schema-aligned
        // zero rows, never a throw — the offset log is the authority
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else VersionedTable.changes(spark, path, from.toInt, to.toInt)
    PlanShim.asStreaming(spark, align(batch))
  }

  /** Conform a changes() result to the declared stream schema exactly:
    * same columns, same order, same types (a column introduced after
    * stream start is dropped; one missing from an old diff reads null). */
  private def align(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftVtStreamSource[$path]"
}
