package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation,
  LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Parquet scan over an ALREADY-KNOWN file list — no directory listing, no
  * file-status fetches, no footer schema inference. `spark.read.parquet`
  * over N explicit leaf paths re-stats every one of them through
  * InMemoryFileIndex (and above 32 paths spawns a distributed listing JOB
  * for what is pure metadata); a manifest-backed table already knows each
  * file's size, so the scan can start immediately. This is the
  * Delta/Iceberg shape: the manifest IS the file index. Pushdown is
  * unaffected — the relation is a normal HadoopFsRelation, so column
  * pruning and predicate pushdown reach the parquet reader exactly as
  * before (the file sizes drive split planning, which is why they must be
  * the files' REAL lengths). */
object FileIndexShim {

  private final class KnownFilesIndex(files: Array[FileStatus])
      extends FileIndex {
    override def rootPaths: Seq[Path] = files.map(_.getPath).toSeq
    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression])
        : Seq[PartitionDirectory] =
      Seq(PartitionDirectory(InternalRow.empty, files))
    override def inputFiles: Array[String] = files.map(_.getPath.toString)
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = files.map(_.getLen).sum
    override def partitionSchema: StructType = StructType(Nil)
  }

  /** A DataFrame scanning exactly `files` (path, length, modTime) with the
    * given data schema. Equivalent to
    * `spark.read.schema(schema).parquet(paths: _*)` minus all listing I/O;
    * partition-column reconstruction is OFF (explicit leaf files), matching
    * that reader's semantics. */
  def parquetKnownFiles(spark: SparkSession,
                        files: Seq[(String, Long, Long)],
                        schema: StructType): DataFrame = {
    val statuses = files.map { case (p, len, mtime) =>
      new FileStatus(len, false, 1, 0, mtime, new Path(p))
    }.toArray
    val relation = HadoopFsRelation(
      new KnownFilesIndex(statuses),
      partitionSchema = StructType(Nil),
      // file sources read every column nullable — `spark.read.schema(u)`
      // forces the same, and a recorded non-nullable field surviving here
      // changes downstream analysis (e.g. UPDATE alignment inserting
      // AssertNotNull around assignments)
      dataSchema = schema.asNullable,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    PlanShim.ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }
}
