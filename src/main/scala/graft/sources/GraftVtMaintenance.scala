package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

/** SQL maintenance statements for `graftvt` tables — the non-ANSI verbs
  * Spark's grammar does not know, added the way Delta adds them: a
  * DELEGATING PARSER injected via `SparkSessionExtensions.injectParser`
  * that recognizes exactly three statement families and hands everything
  * else to Spark's own parser unchanged (Delta ships DeltaSqlParser with
  * an ANTLR grammar; three fixed shapes need only anchored patterns):
  *
  *   - `OPTIMIZE t` → [[VersionedTable.optimizeCommit]] (compact the live
  *     rows to one file per partition, as a commit — time travel across it)
  *   - `OPTIMIZE t ZORDER BY (c1, c2)` → [[VersionedTable.zorderCommit]]
  *     (Morton-clustered rewrite with 2-column manifest stats)
  *   - `VACUUM t [RETAIN n VERSIONS] [GRACE n HOURS]` →
  *     [[VersionedTable.vacuum]] (reclaim files no retained snapshot
  *     references; default retains 10 versions with a 7-day in-flight
  *     grace — `GRACE 0 HOURS` opts a quiesced table out)
  *   - `DESCRIBE HISTORY t` → [[VersionedTable.history]] rows (bounded by
  *     the version count — the same driver-side shape as Delta's)
  *   - `RESTORE [TABLE] t TO VERSION AS OF n` (or `TO TIMESTAMP AS OF
  *     <epoch-ms>`) → [[VersionedTable.restoreCommit]] (zero-copy
  *     rollback-as-a-commit — history keeps growing, the restore is
  *     itself time-travelable and undoable)
  *   - `CONVERT TO graftvt '<path>' PARTITIONED BY (c1[, c2])` →
  *     [[VersionedTable.convert]] (zero-copy in-place adoption of an
  *     existing Hive-layout parquet directory — Delta's CONVERT TO DELTA;
  *     path-addressed because the directory is by definition not yet a
  *     catalog table)
  *   - `ALTER TABLE t DROP COLUMN[S] ...` →
  *     [[VersionedTable.dropColumnsCommit]] (metadata-only schema
  *     narrowing) — claimed only when a catalog probe says the table IS
  *     graftvt, since this shape belongs to Spark's grammar (see
  *     [[isGraftVt]]; ADD COLUMNS instead rides Spark's v1 command via
  *     [[GraftVtAlterRule]])
  *   - `ALTER TABLE t RENAME COLUMN a TO b` →
  *     [[VersionedTable.renameColumnCommit]] (an explicit REWRITE commit
  *     — no column mapping in a name-addressed log), same catalog-probed
  *     claim as DROP
  *
  * The table name resolves through the session catalog at EXECUTION time
  * (`spark.table`), so temp views over graftvt paths work exactly like
  * persistent tables. Each command returns its metrics as rows (commit
  * version + file counts, or deleted-file count), so the statements
  * compose in SQL pipelines and grade like any query. Statements that
  * match a pattern but name a non-graftvt table fail with a clear error —
  * they never fall through to Spark, which has no such verbs anyway.
  * Shadowing note: `DESC[RIBE] HISTORY <col>` on a table literally named
  * `history` is shadowed by the HISTORY verb (Delta has the same
  * collision); use `DESCRIBE TABLE history <col>`.
  */
final class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  // the column list is captured loosely and validated in the command, so
  // `ZORDER BY (a)` / `(a, b, c)` get a clear "exactly 2 columns" error
  // instead of falling through to Spark's inscrutable parse failure.
  // Table names accept plain dotted identifiers AND backquoted ones
  // (`my-table`) — the quoted form passes to catalog resolution verbatim
  // (spark.table parses backquotes), so special-character names get
  // graft's clear errors rather than falling through to Spark's parser
  // (which has no such verbs).
  private val ident = """(`[^`]+`|[\w.]+)"""
  private val optimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + ident +
      """\s*(?:ZORDER\s+BY\s*\(([^)]*)\)\s*)?;?\s*$""").r
  private val vacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + ident +
      """\s*(?:RETAIN\s+(\d+)\s+VERSIONS\s*)?""" +
      """(?:GRACE\s+(\d+)\s+HOURS\s*)?;?\s*$""").r
  private val historyRe =
    ("""(?is)^\s*(?:DESC|DESCRIBE)\s+HISTORY\s+""" + ident + """\s*;?\s*$""").r
  private val restoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + ident +
      """\s+TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val convertRe =
    """(?is)^\s*CONVERT\s+TO\s+GRAFTVT\s+'([^']+)'\s+PARTITIONED\s+BY\s*\(([^)]*)\)\s*;?\s*$""".r
  // `ALTER TABLE t DROP COLUMN c` / `DROP COLUMNS (c1, c2)` — Spark's own
  // grammar parses this but ResolveSessionCatalog rejects it for every V1
  // table BEFORE an injected resolution rule could swap the plan (the ADD
  // COLUMNS route via GraftVtAlterRule works only because Spark converts
  // that one to a v1 command first), so DROP intercepts at the parser —
  // guarded by a catalog provider probe so non-graftvt tables fall
  // through to Spark's grammar and keep Spark's error
  private val alterDropRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + ident +
      """\s+DROP\s+COLUMNS?\s+(?:\(([^)]*)\)|([^()]+?))\s*;?\s*$""").r
  // `ALTER TABLE t RENAME COLUMN a TO b` — same V1-rejection story as
  // DROP, same catalog-probed parser claim; the command is a REWRITE
  // commit (no column mapping in a name-addressed log)
  private val alterRenameRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + ident +
      """\s+RENAME\s+COLUMN\s+(`[^`]+`|\w+)\s+TO\s+(`[^`]+`|\w+)""" +
      """\s*;?\s*$""").r
  // `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` / `DROP CONSTRAINT
  // name` — Delta's constraint DDL shape; the greedy expression capture
  // spans to the LAST ')', so nested parens stay balanced
  private val addConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + ident +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*$""").r
  private val dropConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + ident +
      """\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*$""").r
  // `CREATE TABLE t SHALLOW CLONE s [VERSION AS OF n] LOCATION '<path>'`
  // — Delta's clone verb (not Spark grammar, so the claim is
  // unconditional like OPTIMIZE); LOCATION is required because a clone is
  // by definition a new external table
  private val cloneRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + ident +
      """\s+SHALLOW\s+CLONE\s+""" + ident +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """\s+LOCATION\s+'([^']+)'\s*;?\s*$""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case optimizeRe(t, zlist) =>
      val zCols = Option(zlist).map { s =>
        val cols = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (cols.length != 2 || !cols.forall(_.matches("\\w+")))
          throw new UnsupportedOperationException(
            "graftvt OPTIMIZE: ZORDER BY takes exactly two plain columns " +
            s"(the Morton interleave is pairwise), got (${s.trim})")
        (cols(0), cols(1))
      }
      GraftOptimizeCommand(t, zCols)
    case vacuumRe(t, n, g) =>
      GraftVacuumCommand(t, Option(n).map(_.toInt).getOrElse(10),
        graceMs = Option(g).map(_.toLong * 3600L * 1000L)
          .getOrElse(GraftVacuumCommand.DefaultGraceMs))
    case historyRe(t) =>
      GraftDescribeHistoryCommand(t)
    case restoreRe(t, kind, n) =>
      GraftRestoreCommand(t, n.toLong,
        byTimestamp = kind.equalsIgnoreCase("TIMESTAMP"))
    case convertRe(p, cols) =>
      val pCols = cols.split(",").map(_.trim).filter(_.nonEmpty)
      if (pCols.isEmpty || !pCols.forall(_.matches("\\w+")))
        throw new UnsupportedOperationException(
          s"graftvt CONVERT: PARTITIONED BY needs plain column names, " +
          s"got (${cols.trim})")
      GraftConvertCommand(p, pCols.mkString(","))
    case alterDropRe(t, plist, bare) if isGraftVt(t) =>
      val names = Option(plist).getOrElse(bare).split(",")
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        .toSeq
      if (names.isEmpty || !names.forall(_.matches("\\w+")))
        throw new UnsupportedOperationException(
          "graftvt ALTER TABLE DROP COLUMNS: plain column names only, " +
          s"got ${Option(plist).getOrElse(bare).trim}")
      GraftVtDropColumnsCommand(t, names)
    case alterRenameRe(t, from, to) if isGraftVt(t) =>
      GraftVtRenameColumnCommand(t,
        from.stripPrefix("`").stripSuffix("`"),
        to.stripPrefix("`").stripSuffix("`"))
    case addConstraintRe(t, name, ex) if isGraftVt(t) =>
      GraftVtConstraintCommand(t, name, Some(ex.trim))
    case dropConstraintRe(t, name) if isGraftVt(t) =>
      GraftVtConstraintCommand(t, name, None)
    case cloneRe(dst, src, v, loc) =>
      GraftCloneCommand(dst, src, Option(v).map(_.toInt), loc)
    // everything else — including ALTER TABLE DROP/RENAME on non-graftvt
    // tables — is Spark's grammar, with one post-parse substitution:
    // `FROM t VERSION|TIMESTAMP AS OF ...` (which Spark parses but cannot
    // resolve for V1 relations) becomes the graft time-travel placeholder,
    // resolved by GraftVtTimeTravelRule (see GraftVtTimeTravel.scala)
    case _ => GraftVtTimeTravel.substitute(delegate.parsePlan(sqlText))
  }

  /** Catalog-metadata probe for the ALTER DROP route — the ONE statement
    * family whose shape belongs to Spark's grammar, so graft may claim it
    * only for its own tables. A name that is no catalog table (temp view,
    * nonexistent, unparseable) answers false and the statement delegates
    * unchanged. */
  private def isGraftVt(table: String): Boolean =
    try {
      val id = delegate.parseTableIdentifier(table)
      session.sessionState.catalog.getTableMetadata(id)
        .provider.exists(_.equalsIgnoreCase("graftvt"))
    } catch { case _: Exception => false }


  override def parseQuery(sqlText: String): LogicalPlan =
    GraftVtTimeTravel.substitute(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

private[sources] object GraftVtMaintenance {

  /** Resolve a statement's table name to its graftvt relation through the
    * session catalog — execution-time, so the parser stays resolution-free
    * and temp views work. Mutating verbs ([[GraftVtDml.requireMutable]])
    * reject pinned/filtered views; DESCRIBE HISTORY is read-only and
    * passes `mutating = false`. */
  def resolve(spark: SparkSession, table: String, what: String,
              mutating: Boolean = true)
      : (GraftVtRelation, String, String, Option[String]) = {
    val plan = spark.table(table).queryExecution.analyzed
    val rel = GraftVtDml.targetOf(plan).getOrElse(
      throw new UnsupportedOperationException(
        s"graftvt $what: $table is not a graftvt table"))._2
    if (mutating) GraftVtDml.requireMutable(rel, what)
    val partitionCol = rel.tableParameters.getOrElse("partitionCol",
      throw new IllegalArgumentException(
        s"graftvt $what: table must declare a 'partitionCol' option"))
    (rel, rel.path, partitionCol, rel.tableParameters.get("statsCol"))
  }

  /** Push a statement's post-commit table schema into the catalog when the
    * name IS a catalog table (temp views keep only their refreshed
    * relation). Writes through the EXTERNAL catalog:
    * `SessionCatalog.alterTableDataSchema` hard-refuses schemas that LOSE
    * columns (Spark has no V1 drop to validate for), and both DROP
    * COLUMNS and RESTORE-across-a-drop legitimately narrow. */
  def syncCatalogSchema(spark: SparkSession, table: String,
                        schema: StructType): Unit = {
    val catalog = spark.sessionState.catalog
    val meta =
      try Some(catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table)))
      catch { case _: Exception => None }
    meta.filter(_.provider.exists(_.equalsIgnoreCase("graftvt")))
      .filter(_.schema != schema).foreach { m =>
        spark.sharedState.externalCatalog.alterTableDataSchema(
          m.identifier.database.getOrElse(catalog.getCurrentDatabase),
          m.identifier.table, schema)
        catalog.refreshTable(m.identifier)
      }
  }
}

/** `OPTIMIZE t [ZORDER BY (c1, c2)]` — compaction (or Morton
  * re-clustering, 8 output files) of the live rows as one versioned
  * commit; returns (version, files added, files removed). */
final case class GraftOptimizeCommand(table: String,
                                      zCols: Option[(String, String)])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (rel, path, partitionCol, statsCol) =
      GraftVtMaintenance.resolve(spark, table, "OPTIMIZE")
    val c = zCols match {
      case Some((a, b)) => VersionedTable.zorderCommit(spark, path,
        partitionCol, Seq(a, b), files = 8, statsCol = statsCol)
      case None => VersionedTable.optimizeCommit(spark, path, partitionCol,
        statsCol = statsCol)
    }
    rel.refreshSnapshot()
    Seq(Row(c.version, c.filesAdded.toLong, c.filesRemoved.toLong))
  }
}

/** `VACUUM t [RETAIN n VERSIONS] [GRACE n HOURS]` — reclaims
  * data/tombstone files no retained snapshot references; returns the
  * deleted-file count. The grace is the in-flight-writer window
  * ([[VersionedTable.vacuum]]'s `inflightGraceMs`): files younger than it
  * are never reaped, because a concurrently-committing loser's
  * rebase-window files could otherwise be deleted while the rebased
  * manifest still references them. The SQL default is 7 days (Delta's
  * retention floor for the same hazard); `GRACE 0 HOURS` is the explicit
  * opt-out for quiesced tables — tests and single-writer maintenance
  * jobs — matching the library default. */
final case class GraftVacuumCommand(table: String, retainLast: Int,
                                    graceMs: Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("n_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, path, _, _) = GraftVtMaintenance.resolve(spark, table, "VACUUM")
    val deleted = VersionedTable.vacuum(spark, path, retainLast,
      inflightGraceMs = graceMs)
    Seq(Row(deleted.size.toLong))
  }
}

object GraftVacuumCommand {
  /** 7 days, Delta's default retention for the identical reap-vs-in-flight
    * hazard. */
  val DefaultGraceMs: Long = 7L * 24 * 3600 * 1000
}

/** `RESTORE [TABLE] t TO VERSION AS OF n` / `TO TIMESTAMP AS OF ms` —
  * zero-copy rollback as a commit ([[VersionedTable.restoreCommit]]);
  * returns (version, files re-added/materialized, files removed). */
final case class GraftRestoreCommand(table: String, at: Long,
                                     byTimestamp: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (rel, path, partitionCol, statsCol) =
      GraftVtMaintenance.resolve(spark, table, "RESTORE")
    val toVersion =
      if (byTimestamp) VersionedTable.versionAsOf(spark, path, at)
      else at.toInt
    val c = VersionedTable.restoreCommit(spark, path, toVersion,
      partitionCol, statsCol)
    rel.refreshSnapshot()
    // restore restores the SCHEMA too (rolling back across an ALTER) —
    // keep the catalog's stored copy in step or the V1 relation check
    // rejects the next resolution
    GraftVtMaintenance.syncCatalogSchema(spark, table,
      VersionedTable.read(spark, path, c.version).schema)
    Seq(Row(c.version, c.filesAdded.toLong, c.filesRemoved.toLong))
  }
}

/** `CONVERT TO graftvt '<path>' PARTITIONED BY (...)` — zero-copy
  * in-place adoption of an existing Hive-layout parquet directory
  * ([[VersionedTable.convert]]); returns (version 0, files imported). */
final case class GraftConvertCommand(path: String, partitionCol: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val c = VersionedTable.convert(spark, path, partitionCol)
    Seq(Row(c.version, c.filesAdded.toLong))
  }
}

/** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n] LOCATION p` —
  * zero-copy dataset fork ([[VersionedTable.cloneCommit]]): the clone's
  * v0 re-references the source snapshot's files in place, carrying its
  * schema, stats, live tombstones and CHECK constraints; both tables then
  * diverge independently. The new table registers in the catalog with the
  * source's partitionCol/statsCol options. Returns
  * (version 0, n_referenced, src_version). */
final case class GraftCloneCommand(dst: String, src: String,
                                   srcVersion: Option[Int], location: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_referenced", LongType, nullable = false)(),
    AttributeReference("src_version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, srcPath, partitionCol, statsCol) =
      GraftVtMaintenance.resolve(spark, src, "SHALLOW CLONE",
        mutating = false)
    val v = srcVersion.getOrElse(
      VersionedTable.latestVersion(spark, srcPath))
    val c = VersionedTable.cloneCommit(spark, location, srcPath, v)
    val stats = statsCol.map(s => s", statsCol '$s'").getOrElse("")
    spark.sql(s"CREATE TABLE $dst USING graftvt OPTIONS " +
      s"(path '$location', partitionCol '$partitionCol'$stats)")
    Seq(Row(0, c.filesAdded.toLong, v))
  }
}

/** `DESCRIBE HISTORY t` — the commit log's metadata rows (version, ts,
  * operation, file-op counts, row-count deltas), one per version. */
final case class GraftDescribeHistoryCommand(table: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("ts", LongType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("n_added", LongType)(),
    AttributeReference("n_tombstones", LongType)(),
    AttributeReference("n_removed", LongType)(),
    AttributeReference("n_recs_added", LongType)(),
    AttributeReference("n_recs_tombstoned", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, path, _, _) = GraftVtMaintenance.resolve(spark, table,
      "DESCRIBE HISTORY", mutating = false)
    VersionedTable.history(spark, path)
      .select(col("version").cast("int"), col("ts").cast("long"),
        col("operation").cast("string"), col("n_added").cast("long"),
        col("n_tombstones").cast("long"), col("n_removed").cast("long"),
        col("n_recs_added").cast("long"),
        col("n_recs_tombstoned").cast("long"))
      .collect().toSeq
  }
}
