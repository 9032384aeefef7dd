package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: skew mitigation and co-located joins.
  *
  * AQE (`spark.sql.adaptive.optimizeSkewedJoin`) handles most runtime skew;
  * these are the explicit tools for when the skew is known up front (a hot
  * user_id, a null-heavy foreign key) or when a shuffle must be avoided
  * entirely (bucketed fact-fact joins).
  */
object Scale {

  /** Skew-safe equi-join: replicate the build side `nSalts`× and scatter
    * the probe side deterministically (content hash, no rand()), so one hot
    * key spreads over `nSalts` reducers. Result is row-identical to
    * `probe.join(build, probe(key) === build(key))`. */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, nSalts: Int): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col): _*), lit(nSalts)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") && col(probeKey) === col(buildKey))
      .drop("__salt")
  }

  /** Split-union pattern for ONE known hot key: broadcast-join the hot
    * slice, shuffle-join the rest (no replication cost on the long tail). */
  def hotKeyJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, hotValue: Column): DataFrame = {
    val hotProbe = probe.filter(col(probeKey) === hotValue)
    val coldProbe = probe.filter(col(probeKey) =!= hotValue || col(probeKey).isNull)
    val hotBuild = build.filter(col(buildKey) === hotValue)
    hotProbe.join(broadcast(hotBuild), col(probeKey) === col(buildKey))
      .unionByName(coldProbe.join(build, col(probeKey) === col(buildKey)))
  }

  /** Write `df` as a bucketed+sorted table (external, at `path`): two
    * tables bucketed the same way join with ZERO Exchange — the co-located
    * fact-fact join shape for repeated large joins. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .option("path", path).mode("overwrite").saveAsTable(table)

  /** Compact a parquet directory to ~`targetFileMB` files (the small-file
    * problem: streaming sinks and fine-grained partitions accumulate tiny
    * files that wreck scan parallelism and NameNode/listing cost at scale).
    * Sizes the rewrite from the actual on-disk bytes; `sortCols` optionally
    * re-clusters for min/max skipping. Writes to `outPath` (never in-place:
    * a failed rewrite must not destroy the source). */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetFileMB: Int = 128,
              sortCols: Seq[String] = Nil): Long = {
    val bytes = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    out.write.mode("overwrite").parquet(outPath)
    nFiles.toLong
  }
}
