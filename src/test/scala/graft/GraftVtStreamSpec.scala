package graft

import java.nio.file.Files
import graft.sources.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** `spark.readStream.format("graftvt")` — the commit log as a streaming
  * CDF source (GraftVtStreamSource). Semantics pinned here, each one a
  * production failure mode:
  *   - AvailableNow + maxVersionsPerTrigger=1 drains the FULL history one
  *     version per microbatch (the generic AvailableNow wrapper would fence
  *     at the first rate-capped offset — SupportsTriggerAvailableNow is
  *     implemented directly to prevent exactly that);
  *   - a checkpointed restart resumes AFTER the last committed version,
  *     never re-delivering and never skipping;
  *   - startingVersion=latest skips history;
  *   - the stream schema pins to the start-of-stream union schema, old
  *     diffs reading null for later-added columns.
  */
class GraftVtStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** 3-version table: v0 create (k 1..6, two partitions), v1 append
    * (k 11..13), v2 append carrying a NEW column `tag`. */
  private def newTable(): String = {
    val dir = Files.createTempDirectory("graft_vts").toString + "/t"
    def rows(ids: Seq[Long]) = ids.toDF("k")
      .select($"k", ($"k" * 10).as("v"),
        concat(lit("p"), ($"k" % 2).cast("string")).as("p"))
    VersionedTable.create(spark, dir, rows(1L to 6L), "p")
    VersionedTable.appendCommit(spark, dir, rows(11L to 13L), "p")
    VersionedTable.appendCommit(spark, dir,
      rows(21L to 22L).withColumn("tag", lit("late")), "p")
    dir
  }

  /** Run the graftvt stream into a per-batch parquet sink; returns the
    * collected (bid, version, change_type, k) rows. */
  private def drain(dir: String, ckpt: String, sink: String,
                    options: Map[String, String]): DataFrame = {
    val q = options.foldLeft(spark.readStream.format("graftvt")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, bid: Long) =>
        b.withColumn("bid", lit(bid))
          .write.mode("overwrite").parquet(s"$sink/b=$bid")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // drop the partition column Spark infers from the b=<bid> dir layout
    // (bid is also recorded per row); filter the position-marking empty
    // batches out by reading only dirs that produced files
    spark.read.parquet(sink).drop("b")
  }

  test("AvailableNow + maxVersionsPerTrigger=1 drains one version per batch") {
    val dir = newTable()
    val root = Files.createTempDirectory("graft_vts_run").toString
    val got = drain(dir, s"$root/ckpt", s"$root/sink",
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "1"))
    // every row's microbatch id equals its commit version — one version
    // per batch, in commit order
    assert(got.filter($"bid" =!= $"_commit_version".cast("long")).count() === 0)
    val perV = got.groupBy($"_commit_version").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perV === Map(0 -> 6L, 1 -> 3L, 2 -> 2L))
    assert(got.filter($"_change_type" =!= "insert").count() === 0)
  }

  test("startingTimestamp resolves to the first commit at-or-after the ts") {
    val dir = Files.createTempDirectory("graft_vts").toString + "/t"
    def rows(ids: Seq[Long]) = ids.toDF("k")
      .select($"k", ($"k" * 10).as("v"),
        concat(lit("p"), ($"k" % 2).cast("string")).as("p"))
    VersionedTable.create(spark, dir, rows(1L to 3L), "p", ts = Some(1000L))
    VersionedTable.appendCommit(spark, dir, rows(11L to 12L), "p",
      ts = Some(2000L))
    VersionedTable.appendCommit(spark, dir, rows(21L to 22L), "p",
      ts = Some(3000L))
    val root = Files.createTempDirectory("graft_vts_run").toString
    // ts=2000 lands exactly on v1 (at-or-after — Delta CDF's convention:
    // "changes since t" must not re-see the snapshot committed before t)
    val got = drain(dir, s"$root/ckpt", s"$root/sink",
      Map("startingTimestamp" -> "2000"))
    assert(got.select($"_commit_version").distinct().collect()
      .map(_.getInt(0)).toSet === Set(1, 2))
    // a ts past every commit starts at the log head: nothing replays
    intercept[IllegalArgumentException] {
      spark.readStream.format("graftvt")
        .option("startingVersion", "0").option("startingTimestamp", "9999")
        .load(dir)
    }
  }

  test("checkpointed restart resumes after the last committed version") {
    val dir = newTable()
    val root = Files.createTempDirectory("graft_vts_restart").toString
    val first = drain(dir, s"$root/ckpt", s"$root/sink1",
      Map("startingVersion" -> "0"))
    assert(first.select($"k").as[Long].collect().toSet ===
      ((1L to 6L) ++ (11L to 13L) ++ (21L to 22L)).toSet)
    // new commit AFTER the first run; same checkpoint → only the delta
    VersionedTable.appendCommit(spark, dir,
      Seq(31L).toDF("k").select($"k", ($"k" * 10).as("v"), lit("p1").as("p")),
      "p")
    val second = drain(dir, s"$root/ckpt", s"$root/sink2",
      Map("startingVersion" -> "0"))
    assert(second.select($"_commit_version").distinct()
      .as[Int].collect().toSeq === Seq(3))
    assert(second.select($"k").as[Long].collect().toSeq === Seq(31L))
  }

  test("startingVersion=latest skips history; next commit flows") {
    val dir = newTable()
    val root = Files.createTempDirectory("graft_vts_latest").toString
    // nothing to emit: history predates the stream
    val q = spark.readStream.format("graftvt")
      .option("startingVersion", "latest").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, bid: Long) =>
        b.withColumn("bid", lit(bid))
          .write.mode("overwrite").parquet(s"$root/sink/b=$bid")
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val empty = !fs.exists(new org.apache.hadoop.fs.Path(s"$root/sink")) ||
      spark.read.parquet(s"$root/sink").isEmpty
    assert(empty)
    // a commit made after stream start is delivered on the next run
    VersionedTable.appendCommit(spark, dir,
      Seq(41L).toDF("k").select($"k", ($"k" * 10).as("v"), lit("p0").as("p")),
      "p")
    val next = drain(dir, s"$root/ckpt", s"$root/sink2",
      Map("startingVersion" -> "latest"))
    assert(next.select($"k").as[Long].collect().toSeq === Seq(41L))
  }

  test("stream schema pins start-of-stream union; old diffs read null") {
    val dir = newTable()
    val root = Files.createTempDirectory("graft_vts_schema").toString
    val got = drain(dir, s"$root/ckpt", s"$root/sink",
      Map("startingVersion" -> "0"))
    assert(got.columns.toSet ===
      Set("_commit_version", "_change_type", "k", "v", "p", "tag", "bid"))
    // `tag` arrived in v2: null on every earlier version's rows
    assert(got.filter($"_commit_version" < 2 && $"tag".isNotNull).count() === 0)
    assert(got.filter($"_commit_version" === 2 && $"tag" === "late").count() === 2)
  }

  test("graftvt sink: one commit per microbatch, exactly-once across a " +
      "duplicate-delivery replay") {
    val root = Files.createTempDirectory("graft_vts_sink").toString
    val landing = s"$root/landing"
    val tbl = s"$root/table"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType)))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema).parquet(landing)
        .writeStream.format("graftvt")
        .option("partitionCol", "p")
        .option("txnAppId", "spec")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(tbl)
      q.awaitTermination()
    }
    (0 to 2).foreach { i =>
      Seq.range(i * 10L, i * 10L + 3L).toDF("k")
        .select($"k", lit(s"p$i").as("p"))
        .coalesce(1).write.mode("append").parquet(landing)
      run(s"$root/ckpt")
    }
    assert(VersionedTable.latestVersion(spark, tbl) === 2)
    // version v holds exactly files 0..v
    (0 to 2).foreach { v =>
      assert(VersionedTable.read(spark, tbl, v).count() === (v + 1) * 3L)
    }
    // duplicate delivery: fresh checkpoint re-reads every landing file
    // under the same txnAppId — the sink must skip all replayed batches
    run(s"$root/ckpt2")
    assert(VersionedTable.latestVersion(spark, tbl) === 2)
    assert(VersionedTable.read(spark, tbl, 2).count() === 9L)
    // a DIFFERENT app id is not deduped: it appends (two queries feeding
    // one table are distinct transactions)
    val q2 = spark.readStream.schema(schema).parquet(landing)
      .writeStream.format("graftvt")
      .option("partitionCol", "p").option("txnAppId", "other")
      .option("checkpointLocation", s"$root/ckpt3")
      .trigger(Trigger.AvailableNow()).start(tbl)
    q2.awaitTermination()
    assert(VersionedTable.latestVersion(spark, tbl) > 2)
    assert(VersionedTable.read(spark, tbl,
      VersionedTable.latestVersion(spark, tbl)).count() === 18L)
  }

  test("graftvt sink rejects non-append output modes") {
    val root = Files.createTempDirectory("graft_vts_mode").toString
    val ex = intercept[Exception] {
      val q = spark.readStream.format("graftvt")
        .option("startingVersion", "0").load(newTable())
        .groupBy($"p").count()
        .writeStream.format("graftvt")
        .outputMode("complete")
        .option("partitionCol", "p")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start(s"$root/t")
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("Append only") ||
      Option(ex.getCause).exists(_.getMessage.contains("Append only")))
  }

  test("merge and delete commits stream as insert+delete diffs") {
    val dir = newTable()
    VersionedTable.mergeCommit(spark, dir,
      Seq((1L, 999L, "p1", "U", 1L), (2L, 20L, "p0", "D", 1L))
        .toDF("k", "v", "p", "op", "seq"),
      Seq("k"), "p")
    val root = Files.createTempDirectory("graft_vts_merge").toString
    val got = drain(dir, s"$root/ckpt", s"$root/sink",
      Map("startingVersion" -> "3"))
    val byType = got.groupBy($"_change_type").agg(collect_list($"k"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(byType("insert") === Seq(1L))      // new image of the update
    assert(byType("delete") === Seq(1L, 2L))  // old image + the delete
  }
}
