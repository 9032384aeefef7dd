package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the VersionedTable log layer's three cost claims:
  *
  *  1. SNAPSHOT-READ OVERHEAD — reading the latest snapshot through the
  *     manifest (explicit leaf files) vs a plain directory read of the
  *     same files: the log adds a driver-side manifest read and skips the
  *     directory listing; the scan itself is identical.
  *  2. CHECKPOINT REPLAY — resolving the live set of a table with many
  *     commits, from-scratch (every manifest) vs after checkpoint()
  *     (checkpoint + tail). This is the log-growth control, measured.
  *  3. MERGE-COMMIT PREMIUM — a versioned mergeCommit vs MergeSink's
  *     in-place mergeInto on the same change batch: the same COW dataflow
  *     plus manifest bookkeeping; the delta is the price of time travel.
  *
  * Run: `sbt "runMain graft.VtBench [n] [commits]"`.
  */
object VtBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val commits = if (args.length > 1) args(1).toInt else 120
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def base = spark.range(n).select(
      $"id".as("k"), ($"id" * 7 % 1000003).as("v"),
      (($"id" * 2654435761L) % 50).cast("string").as("p"))

    val root = java.nio.file.Files.createTempDirectory("graft_vtb").toString

    // 1. snapshot-read overhead vs plain directory read
    val vt = s"$root/vt"
    sources.VersionedTable.create(spark, vt, base, "p")
    val plain = s"$root/plain"
    base.repartition($"p").write.partitionBy("p").mode("overwrite").parquet(plain)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum($"k"), sum($"v")).collect().head
    def min2[A](f: => A): Double = { val a = timed(f)._1; math.min(a, timed(f)._1) }
    val (tResolve, _) = timed(sources.VersionedTable.liveFiles(spark, vt, 0))
    val tVtRead = min2(agg(sources.VersionedTable.read(spark, vt, 0)))
    val tPlain = min2(agg(spark.read.parquet(plain)))
    require(agg(sources.VersionedTable.read(spark, vt, 0)) ==
      agg(spark.read.parquet(plain)), "snapshot read diverged")
    println(f"[vtbench] manifest_resolve_s=$tResolve%.2f " +
      f"snapshot_read_s=$tVtRead%.2f plain_read_s=$tPlain%.2f " +
      f"(resolve is a FIXED driver cost, not per-byte)")

    // 2. checkpoint replay on a long commit chain (tiny appends — the cost
    // under measurement is log replay, not data)
    val chain = s"$root/chain"
    sources.VersionedTable.create(spark, chain,
      Seq((0L, 0L, "p0")).toDF("k", "v", "p"), "p")
    (1 to commits).foreach { i =>
      sources.VersionedTable.appendCommit(spark, chain,
        Seq((i.toLong, i.toLong, s"p${i % 8}")).toDF("k", "v", "p"), "p")
    }
    val (tScratch, livesA) = timed(
      sources.VersionedTable.liveFiles(spark, chain, commits))
    sources.VersionedTable.checkpoint(spark, chain, commits)
    val (tCkpt, livesB) = timed(
      sources.VersionedTable.liveFiles(spark, chain, commits))
    require(livesA.toSet == livesB.toSet, "checkpoint replay diverged")
    println(f"[vtbench] commits=$commits replay_scratch_s=$tScratch%.2f " +
      f"replay_checkpoint_s=$tCkpt%.2f speedup=${tScratch / tCkpt}%.1fx")

    // 3. merge-commit premium vs in-place MergeSink
    def changes = base.filter($"p" === "3" && $"k" % 100 === 0)
      .select($"k", ($"v" + 1).as("v"), $"p", lit("U").as("op"), lit(1L).as("seq"))
    // re-applying the same upsert batch does identical work (same affected
    // slice rewritten), so min-of-2 removes first-touch warmth skew
    val inPlace = s"$root/inplace"
    base.repartition($"p").write.partitionBy("p").mode("overwrite").parquet(inPlace)
    val tSink = min2(
      sources.MergeSink.mergeInto(spark, inPlace, changes, Seq("k"), "p"))
    val tVtMerge = min2(
      sources.VersionedTable.mergeCommit(spark, vt, changes, Seq("k"), "p"))
    println(f"[vtbench] merge_inplace_s=$tSink%.2f merge_versioned_s=$tVtMerge%.2f " +
      f"premium=${(tVtMerge / tSink - 1) * 100}%.0f%%")

    // 4. merge-on-read delete vs COW on the skewed worst case: ONE row per
    // partition (50 partitions) — COW rewrites all 50 partitions to delete
    // 50 rows; the deletion vector writes 50-row tombstone files and
    // touches no data. Also prices the read side: the DV read pays the
    // tombstone anti-join until a merge/optimize materializes it.
    val delKeys = base.groupBy($"p").agg(min($"k").as("k")).select($"k", $"p")
    val vtCow = s"$root/vtcow"
    val vtDv = s"$root/vtdv"
    sources.VersionedTable.create(spark, vtCow, base, "p")
    sources.VersionedTable.create(spark, vtDv, base, "p")
    val (tCowDel, cCow) = timed(sources.VersionedTable.mergeCommit(
      spark, vtCow, delKeys.withColumn("v", lit(0L))
        .withColumn("op", lit("D")).withColumn("seq", lit(1L)),
      Seq("k"), "p"))
    val (tDvDel, cDv) = timed(
      sources.VersionedTable.deleteCommit(spark, vtDv, delKeys, "p"))
    val tCowRead = min2(agg(sources.VersionedTable.read(spark, vtCow, 1)))
    val tDvRead = min2(agg(sources.VersionedTable.read(spark, vtDv, 1)))
    require(agg(sources.VersionedTable.read(spark, vtCow, 1)) ==
      agg(sources.VersionedTable.read(spark, vtDv, 1)), "DV read diverged from COW")
    println(f"[vtbench] delete_cow_s=$tCowDel%.2f (files +${cCow.filesAdded} " +
      f"-${cCow.filesRemoved}) delete_dv_s=$tDvDel%.2f (files +${cDv.filesAdded} " +
      f"-${cDv.filesRemoved}) write_speedup=${tCowDel / tDvDel}%.1fx " +
      f"read_cow_s=$tCowRead%.2f read_dv_s=$tDvRead%.2f " +
      f"read_premium=${(tDvRead / tCowRead - 1) * 100}%.0f%%")

    // 5. CDF of a deletion-vector commit: the tombstone branch's diff must
    // scan only the tombstones' partitions (the prior-snapshot read is
    // manifest-pruned to them), not the table — before the r10 fix this
    // was a FULL prior-snapshot read, i.e. a 1-partition delete's CDF cost
    // O(table). Reported as files-fed-into-the-diff vs live files.
    val oneDel = base.filter($"p" === "7")
      .groupBy($"p").agg(max($"k").as("k")).select($"k", $"p")
    sources.VersionedTable.deleteCommit(spark, vtDv, oneDel, "p") // v2
    val cdf = sources.VersionedTable.changes(spark, vtDv, 2, 2)
    val nScan = cdf.inputFiles.length
    val nLive = sources.VersionedTable.liveEntries(spark, vtDv, 1).size
    val (tCdf, nCdfRows) = timed(cdf.count())
    require(nCdfRows == 1L, s"expected 1 deleted image, got $nCdfRows")
    println(f"[vtbench] cdf_dv_files_scanned=$nScan of_live=$nLive " +
      f"cdf_dv_s=$tCdf%.2f (diff bounded by the delete's partitions)")

    // 6. z-order payoff: the same 2-D rectangle probed against (a) a
    // hash-fragmented layout with no recorded stats and (b) zorderCommit's
    // Morton-clustered rewrite with 2-column manifest metrics. Reported as
    // files opened + wall time for the pruned read; content equality is
    // asserted. The file-count collapse is the quantity that matters at
    // 100 TB — footer opens, not bytes, dominate a selective probe.
    val vtZ = s"$root/vtz"
    val zbase = spark.range(n).select(
      $"id".as("k"), ($"id" % 4096).as("x"),
      (($"id" * 2654435761L) % 4096).as("y"), lit("all").as("p"))
    sources.VersionedTable.create(spark, vtZ, zbase, "p", fileSplits = 32)
    val zc = sources.VersionedTable.zorderCommit(
      spark, vtZ, "p", Seq("x", "y"), files = 64)
    val zBounds = Map("x" -> (0L, 255L), "y" -> (0L, 255L))
    def rect(df: org.apache.spark.sql.DataFrame) =
      df.filter($"x" <= 255 && $"y" <= 255)
        .agg(count(lit(1)), sum($"k")).collect().head
    val frag = sources.VersionedTable.read(spark, vtZ, 0, None, false, zBounds)
    val zord = sources.VersionedTable.read(spark, vtZ, 1, None, false, zBounds)
    val (nFrag, nZord) = (frag.inputFiles.length, zord.inputFiles.length)
    val tFrag = min2(rect(frag))
    val tZord = min2(rect(zord))
    require(rect(frag) == rect(zord), "z-order rewrite changed content")
    println(f"[vtbench] zorder files_scanned=$nZord of=${zc.filesAdded} " +
      f"(fragmented: $nFrag of 32) probe_frag_s=$tFrag%.2f " +
      f"probe_zorder_s=$tZord%.2f speedup=${tFrag / tZord}%.1fx")
    spark.stop()
  }
}
