package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

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
  * below is a scan-pruning hint, never a correctness dependency. A DSv2
  * `TableProvider` would add catalog integration; the read semantics
  * (this file's whole surface) would be identical.
  */
final class GraftVtSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graftvt"

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
    val version = parameters.get("versionAsOf").map(_.trim.toInt)
      .orElse(parameters.get("timestampAsOf").map(t =>
        VersionedTable.versionAsOf(spark, path, t.trim.toLong)))
      .getOrElse(VersionedTable.latestVersion(spark, path))
    require(version >= 0, s"graftvt: $path has no committed version")
    val mergeSchema = parameters.get("mergeSchema").exists(_.trim.toBoolean)
    val partValues = parameters.get("partitions")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val df = VersionedTable.read(spark, path, version, partValues, mergeSchema)
    new GraftVtRelation(sqlContext, df)
  }
}

private final class GraftVtRelation(override val sqlContext: SQLContext,
                                    snapshot: DataFrame)
    extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = snapshot.schema

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(toColumn)
      .foldLeft(snapshot)((df, c) => df.filter(c))
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
