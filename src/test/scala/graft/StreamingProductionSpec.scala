package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Production-scale streaming modes: RocksDB state store provider,
  * append-mode session windows under watermark, and the foreachBatch
  * incremental-upsert pattern (the reference's E2 consumption shape on a
  * real sink). */
class StreamingProductionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stateful aggregation runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val got = streaming.Streams.queries("stream_tumbling")(spark, TestSpark.sfDir)
      val batch = Tables.events(spark, TestSpark.sfDir)
        .withColumn("ts_us", Tables.tsUs)
        .withColumn("bucket_us", expr("ts_us - ts_us % 3600000000"))
        .groupBy($"bucket_us", $"event_type").count()
      assert(got.count() == batch.count(), "RocksDB-backed result matches batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session windows emit finalized sessions in append mode") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user, epoch_s)
    val agg = mem.toDF().toDF("user", "sec")
      .withColumn("t", timestamp_seconds($"sec"))
      .withWatermark("t", "10 seconds")
      .groupBy(session_window($"t", "60 seconds"), $"user")
      .agg(count(lit(1)).as("n"))
      .select($"user", unix_timestamp($"session_window.start").as("start_s"), $"n")
    val q = agg.writeStream.format("memory").queryName("graft_sess_append")
      .outputMode("append").start()
    try {
      mem.addData((1L, 100L), (1L, 130L), (1L, 300L)) // two sessions for user 1
      q.processAllAvailable()
      mem.addData((9L, 1000L)) // push watermark past both sessions
      q.processAllAvailable()
      mem.addData((9L, 2000L))
      q.processAllAvailable()
      val rows = spark.table("graft_sess_append").as[(Long, Long, Long)]
        .collect().toSet
      assert(rows.contains((1L, 100L, 2L)) && rows.contains((1L, 300L, 1L)),
        s"finalized sessions: $rows")
    } finally q.stop()
  }

  test("foreachBatch applies incremental upsert batches to a parquet target (E2)") {
    val target = Files.createTempDirectory("graft_fb").toString + "/t"
    // seed target: key -> value v1
    Seq((1L, "v1"), (2L, "v1")).toDF("k", "v").write.parquet(target)
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val existing = spark.read.parquet(target)
        val merged = existing.join(batch, Seq("k"), "left_anti")
          .unionByName(batch) // delete-insert upsert per micro-batch
        val tmp = target + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(target)
      }
      .trigger(Trigger.AvailableNow()).start()
    mem.addData((2L, "v2"), (3L, "v2"))
    q.awaitTermination()
    val got = spark.read.parquet(target).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "v1", 2L -> "v2", 3L -> "v2"),
      s"upserted target: $got")
  }

  test("CDC merge restarts from its checkpoint: interrupted ≡ uninterrupted run") {
    // The stream_cdc_apply production claim is "maintain a table across
    // process restarts". Prove the restart semantics: run N microbatches,
    // STOP the query, restart from the same checkpoint dir, feed the rest
    // — the merged table must equal a run that never stopped. The source
    // offsets live in the checkpoint (resume = no reprocessing, no gap)
    // and the conditional merge (targetSeqCol) is idempotent, which is
    // what turns foreachBatch's at-least-once into exactly-once output.
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_cdc_ckpt").toString
    def seed(dir: String): Unit =
      spark.range(10).select($"id".as("k"), ($"id" * 100).as("cents"),
          lit(0L).as("ev_ts"), ($"id" % 2).cast("string").as("p"))
        .write.partitionBy("p").mode("overwrite").parquet(dir)
    val b1 = Seq((0L, 1000L, 10L, "U"), (1L, 1100L, 10L, "U"), (10L, 500L, 10L, "U"))
    val b2 = Seq((2L, 1200L, 20L, "U"), (1L, 0L, 20L, "D"))
    val b3 = Seq((3L, 1300L, 30L, "U"), (0L, 999L, 5L, "U")) // stale: loses to ev_ts=10
    def start(mem: MemoryStream[(Long, Long, Long, String)],
              dir: String, ckpt: String) =
      mem.toDF().toDF("k", "cents", "ev_ts", "op")
        .withColumn("p", ($"k" % 2).cast("string"))
        .withColumn("seq", $"ev_ts")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          sources.MergeSink.mergeInto(spark, dir, batch, Seq("k"), "p",
            targetSeqCol = Some("ev_ts"))
          ()
        }.start()
    def snapshot(dir: String): Set[(Long, Long, Long)] =
      spark.read.parquet(dir).select($"k", $"cents", $"ev_ts")
        .as[(Long, Long, Long)].collect().toSet

    // interrupted run: b1+b2, stop, RESTART from the checkpoint, b3
    val t1 = s"$root/t1"; seed(t1)
    val m1 = MemoryStream[(Long, Long, Long, String)]
    val q1 = start(m1, t1, s"$root/ckpt")
    m1.addData(b1: _*); m1.addData(b2: _*)
    q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    m1.addData(b3: _*) // lands while the query is DOWN
    val q1b = start(m1, t1, s"$root/ckpt")
    q1b.processAllAvailable(); q1b.stop(); q1b.awaitTermination()

    // uninterrupted reference run over the same batches
    val t2 = s"$root/t2"; seed(t2)
    val m2 = MemoryStream[(Long, Long, Long, String)]
    val q2 = start(m2, t2, s"$root/ckpt2")
    m2.addData(b1: _*); m2.addData(b2: _*); m2.addData(b3: _*)
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()

    val (got, want) = (snapshot(t1), snapshot(t2))
    assert(got == want, s"restarted=$got\nuninterrupted=$want")
    // spot semantics: delete applied, fresh update applied, stale lost
    assert(!got.exists(_._1 == 1L), "deleted key must stay deleted across restart")
    assert(got.contains((0L, 1000L, 10L)), "stale post-restart update must lose")
    assert(got.contains((3L, 1300L, 30L)), "post-restart batch must apply")
  }

  test("streaming ANN index maintenance lands exactly where the batch append does") {
    // The stream_ann_index_maintain contract: per-microbatch two-level
    // assignment against the frozen base-trained centroids, appended via
    // idempotent batch=<id> directories, must produce EXACTLY the
    // occupancy of the one-shot batch append path (ivfAppendLists) — and
    // the landing drops must actually have been consumed as more than one
    // microbatch, or the multi-batch claim is vacuous.
    import graft.functions.AnnSearch
    val got = SparkEntry.queries("stream_ann_index_maintain")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val baseN = e.count() * 9 / 10
    val nC = AnnSearch.autoCentroids(baseN)
    val want = AnnSearch.ivfAppendLists(e, baseN, nC, AnnSearch.autoCoarse(nC),
        AnnSearch.autoTrainN(baseN, nC))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"stream occupancy != batch occupancy")
    val dirs = new java.io.File(s"${graft.fixtureRoot}/stream_ann/inverted")
      .listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs.count(_ != "batch=-1") >= 2,
      s"expected >=2 streamed microbatch dirs, got $dirs")
  }

  test("ANN index maintenance restarts from its checkpoint: interrupted ≡ uninterrupted") {
    // The recovery twin of the CDC restart proof, for the 15th oracle's
    // SINK mechanism: the idempotent batch=<id> directory write. Stop the
    // stream after one batch, restart from the same checkpoint, feed the
    // rest — source offsets resume (no reprocessing, no gap) and a
    // replayed batch would only overwrite its own directory, so the final
    // inverted file must equal a never-interrupted run's.
    import graft.functions.AnnSearch
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_ann_ckpt").toString
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val baseN = e.count() * 9 / 10
    val nC = AnnSearch.autoCentroids(baseN)
    val eqb = AnnSearch.quantize(e.filter($"vec_id" < baseN), "vec_id", "embedding")
    val cent = AnnSearch.trainCentroids(eqb, nC,
      AnnSearch.autoTrainN(baseN, nC), "vec_id")
    val (coarse, f2g) = AnnSearch.coarseFine(cent, AnnSearch.autoCoarse(nC))
    val app = e.filter($"vec_id" >= baseN)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val (b1, b2) = app.splitAt(app.size / 2)
    def start(mem: MemoryStream[(Long, Seq[Double])], dir: String, ckpt: String) =
      mem.toDF().toDF("vec_id", "embedding")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          AnnSearch.assignTwoLevel(
              AnnSearch.quantize(batch, "vec_id", "embedding"),
              coarse, f2g, "vec_id")
            .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$bid")
          ()
        }.start()
    def occupancy(dir: String): Seq[(Long, Long)] =
      spark.read.parquet(dir).groupBy($"cid").agg(count(lit(1)).as("n"))
        .orderBy($"cid").as[(Long, Long)].collect().toSeq
    // interrupted run: batch 1, STOP, restart from the checkpoint, batch 2
    val m1 = MemoryStream[(Long, Seq[Double])]
    val q1 = start(m1, s"$root/t1", s"$root/ckpt1")
    m1.addData(b1: _*); q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    val q1b = start(m1, s"$root/t1", s"$root/ckpt1")
    m1.addData(b2: _*); q1b.processAllAvailable(); q1b.stop(); q1b.awaitTermination()
    // uninterrupted reference
    val m2 = MemoryStream[(Long, Seq[Double])]
    val q2 = start(m2, s"$root/t2", s"$root/ckpt2")
    m2.addData(b1: _*); m2.addData(b2: _*)
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    cent.unpersist()
    val (got, want) = (occupancy(s"$root/t1"), occupancy(s"$root/t2"))
    assert(got.map(_._2).sum == app.size, "every appended vector lands once")
    assert(got == want, s"restarted=$got\nuninterrupted=$want")
  }
}
