package graft

import java.nio.file.Files
import graft.operators.TextOps
import graft.sources.MergeSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming form of pipe_incremental_neardup: a MemoryStream of
  * document change events (upsert/delete) drives foreachBatch, each batch
  * probes the MAINTAINED MinHash-LSH band index and merge-updates both
  * the corpus table and the index via the partition-COW sink. The
  * invariant under test — after EVERY microbatch, the maintained index is
  * row-identical to a from-scratch rebuild over the maintained corpus —
  * is exactly what lets a 100 TB pipeline run this nightly instead of
  * re-signing the corpus. */
class IncrementalNeardupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def bandRows(dd: DataFrame): DataFrame =
    TextOps.minhashBands(dd).select($"doc_id", $"band", $"bh")

  test("per-batch merge-maintained index equals a from-scratch rebuild") {
    val root = Files.createTempDirectory("graft_incr_nd").toString
    val corpusDir = s"$root/corpus"
    val indexDir = s"$root/index"
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text").filter($"doc_id" < 50)

    // day-0 state
    docs.withColumn("p", ($"doc_id" % 8).cast("string"))
      .write.partitionBy("p").mode("overwrite").parquet(corpusDir)
    bandRows(docs).withColumn("band", $"band".cast("string"))
      .write.partitionBy("band").mode("overwrite").parquet(indexDir)

    val probed = scala.collection.mutable.ArrayBuffer.empty[Long]
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("doc_id", "text", "op").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ups = batch.filter(col("op") === "U").select(col("doc_id"), col("text"))
        val dels = batch.filter(col("op") === "D").select(col("doc_id"))
        val nb = bandRows(ups).localCheckpoint()
        // probe the index as maintained so far (pre-merge)
        val idx = batch.sparkSession.read.parquet(indexDir)
          .select(col("doc_id").as("old_id"),
            col("band").cast("int").as("band"), col("bh"))
        probed += nb.join(idx, Seq("band", "bh"))
          .filter(col("old_id") =!= col("doc_id"))
          .select(col("doc_id"), col("old_id")).distinct().count()
        MergeSink.mergeInto(batch.sparkSession, corpusDir,
          ups.withColumn("op", lit("U"))
            .unionByName(dels.withColumn("text", lit(null).cast("string"))
              .withColumn("op", lit("D")))
            .withColumn("p", (col("doc_id") % 8).cast("string"))
            .withColumn("seq", lit(1L)),
          Seq("doc_id"), "p")
        MergeSink.mergeInto(batch.sparkSession, indexDir,
          nb.withColumn("op", lit("U"))
            .unionByName(dels
              .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("band"))
              .withColumn("bh", lit(null).cast("long"))
              .withColumn("op", lit("D")))
            .withColumn("seq", lit(1L)),
          Seq("doc_id"), "band")
        ()
      }.start()

    def assertIndexFresh(batchTag: String): Unit = {
      val merged = spark.read.parquet(indexDir)
        .select($"doc_id", $"band".cast("int").as("band"), $"bh")
      val rebuilt = bandRows(
        spark.read.parquet(corpusDir).select($"doc_id", $"text"))
      assert(merged.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(merged).isEmpty,
        s"$batchTag: maintained index diverged from rebuild")
    }

    // batch 1: brand-new docs, one an exact copy of doc 3 (must be caught
    // by the probe against the MAINTAINED index, not a corpus rescan)
    val copyOf3 = docs.filter($"doc_id" === 3).select($"text").head().getString(0)
    ms.addData((1000L, copyOf3, "U"), (1001L, "one two three four five", "U"))
    q.processAllAvailable()
    assertIndexFresh("batch1")
    assert(probed.head >= 1L, "the exact copy must collide with doc 3's buckets")

    // batch 2: update an existing doc, delete two others, add one more
    ms.addData((3L, copyOf3 + " changed tail words", "U"),
      (7L, null.asInstanceOf[String], "D"),
      (11L, null.asInstanceOf[String], "D"),
      (1002L, "alpha beta gamma delta epsilon zeta", "U"))
    q.processAllAvailable()
    assertIndexFresh("batch2")
    q.stop()

    // deletes really evicted their band rows; update replaced, not dup'd
    val ids = spark.read.parquet(indexDir).select($"doc_id").distinct()
      .as[Long].collect().toSet
    assert(!ids.contains(7L) && !ids.contains(11L))
    val n3 = spark.read.parquet(indexDir).filter($"doc_id" === 3).count()
    assert(n3 == 4L, s"doc 3 must have exactly 4 band rows, got $n3")
  }
}
