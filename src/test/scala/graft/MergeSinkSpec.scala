package graft

import java.nio.file.Files
import graft.sources.MergeSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE INTO over a partitioned parquet table, copy-on-write: the write
  * path the round-2 verdict named as the next thing a 100 TB user asks
  * for. The guarantees under test are the ones that matter at scale:
  * untouched partitions are not even READ (plan-level pruning), their
  * files stay byte-identical, and the rewrite unit is the partition
  * directory.
  */
class MergeSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** (k, price_cents, prio) for prio 1..5, 40 keys per partition. */
  private def baseDf = spark.range(200)
    .select(($"id" + 1).as("k"), ($"id" * 100 + 7).as("price_cents"),
      (($"id" % 5) + 1).cast("string").as("prio"))

  private def writeBase(): String = {
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    baseDf.write.partitionBy("prio").mode("overwrite").parquet(dir)
    dir
  }

  /** partition dir -> sorted (fileName, size, mtime) triples. */
  private def stamps(dir: String, prio: String): Seq[(String, Long, Long)] = {
    val d = new java.io.File(dir, s"prio=$prio")
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.getName.startsWith("part-")).toSeq
      .map(f => (f.getName, f.length(), f.lastModified())).sortBy(_._1)
  }

  private def readState(dir: String): Map[Long, (Long, String)] =
    // partition-type inference reads prio=1 back as INT — normalize
    spark.read.parquet(dir).select($"k", $"price_cents", $"prio".cast("string"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("upsert + delete rewrite only affected partitions; others byte-identical") {
    val dir = writeBase()
    val before = (1 to 5).map(p => p.toString -> stamps(dir, p.toString)).toMap
    // touch prio=1 (update k=1, delete k=6) and prio=3 (insert new k=1000),
    // plus a brand-new partition prio=9 (insert k=2000)
    val changes = Seq(
      (1L, 999999L, "1", "U", 1L),
      (6L, 0L, "1", "D", 1L),
      (1000L, 42L, "3", "U", 1L),
      (2000L, 43L, "9", "U", 1L)
    ).toDF("k", "price_cents", "prio", "op", "seq")
    val st = MergeSink.mergeInto(spark, dir, changes, Seq("k"), "prio")
    assert(st.partitionsRewritten.toSet == Set("1", "3", "9"))

    val state = readState(dir)
    val expect = baseDf.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      .-(6L) // deleted
      .+(1L -> (999999L, "1"), 1000L -> (42L, "3"), 2000L -> (43L, "9"))
    assert(state == expect, "merged table state must equal reference upsert")

    // untouched partitions: identical file names, sizes AND mtimes
    Seq("2", "4", "5").foreach { p =>
      assert(stamps(dir, p) == before(p), s"partition $p must not be rewritten")
    }
    // touched partitions really were rewritten
    Seq("1", "3").foreach { p =>
      assert(stamps(dir, p) != before(p), s"partition $p must be rewritten")
    }
    assert(stamps(dir, "9").nonEmpty, "new partition directory created")
  }

  test("the target read prunes to the affected partitions (plan-level)") {
    val dir = writeBase()
    val plan = spark.read.parquet(dir)
      .filter($"prio".isin("1", "3"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("prio"),
      s"partition-column filter must reach PartitionFilters:\n${plan.take(500)}")
    // and the non-partition path would NOT prune: guard the guarantee the
    // sink relies on by checking the pruned scan reads < all partitions
    val scanned = spark.read.parquet(dir).filter($"prio".isin("1", "3"))
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned.forall(f => f.contains("prio=1") || f.contains("prio=3")),
      "only affected partition files may be touched by the read")
  }

  test("later seq wins among duplicate change keys; idempotent re-apply") {
    val dir = writeBase()
    val changes = Seq(
      (2L, 111L, "2", "U", 1L),
      (2L, 222L, "2", "U", 2L) // later statement wins
    ).toDF("k", "price_cents", "prio", "op", "seq")
    MergeSink.mergeInto(spark, dir, changes, Seq("k"), "prio")
    assert(readState(dir)(2L) == (222L, "2"))
    val once = readState(dir)
    MergeSink.mergeInto(spark, dir, changes, Seq("k"), "prio")
    assert(readState(dir) == once, "MERGE of the same batch is idempotent")
  }

  test("deleting every row of a partition removes its directory (no stale files)") {
    val dir = writeBase()
    // prio=9 born with exactly one row...
    MergeSink.mergeInto(spark, dir,
      Seq((5000L, 1L, "9", "U", 1L)).toDF("k", "price_cents", "prio", "op", "seq"),
      Seq("k"), "prio")
    assert(stamps(dir, "9").nonEmpty)
    // ...then fully deleted: dynamic overwrite alone would leave the old
    // directory in place, resurrecting the row
    MergeSink.mergeInto(spark, dir,
      Seq((5000L, 0L, "9", "D", 1L)).toDF("k", "price_cents", "prio", "op", "seq"),
      Seq("k"), "prio")
    assert(!new java.io.File(dir, "prio=9").exists(), "emptied partition dir removed")
    assert(!readState(dir).contains(5000L))
    assert(readState(dir).size == 200)
  }

  test("partition is part of the merge key: cross-partition move = delete + upsert") {
    val dir = writeBase()
    // k=3 lives in prio=4 (id=2 -> k=3, prio=(2%5)+1=3? compute: k=id+1,
    // prio=(id%5)+1 so k=3 -> id=2 -> prio=3). An upsert of k=3 aimed at
    // prio=2 must NOT move it: it inserts a second row in prio=2.
    MergeSink.mergeInto(spark, dir,
      Seq((3L, 777L, "2", "U", 1L)).toDF("k", "price_cents", "prio", "op", "seq"),
      Seq("k"), "prio")
    val rows = spark.read.parquet(dir)
      .filter($"k" === 3L)
      .select($"price_cents", $"prio".cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((207L, "3"), (777L, "2")),
      s"wrong-partition upsert inserts, never moves: $rows")
    // the documented move spelling: D in the old partition + U in the new
    MergeSink.mergeInto(spark, dir,
      Seq((3L, 0L, "3", "D", 1L), (3L, 888L, "2", "U", 1L))
        .toDF("k", "price_cents", "prio", "op", "seq"),
      Seq("k"), "prio")
    val moved = spark.read.parquet(dir).filter($"k" === 3L)
      .select($"price_cents", $"prio".cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(moved == Set((888L, "2")), s"delete+upsert moves the row: $moved")
  }

  test("seeded randomized batches agree with an in-memory reference merge") {
    val dir = writeBase()
    val ref = scala.collection.mutable.Map.empty[(Long, String), Long]
    baseDf.collect().foreach(r =>
      ref((r.getLong(0), r.getString(2))) = r.getLong(1))
    val rnd = new scala.util.Random(20260813)
    (1 to 6).foreach { batch =>
      val rows = (1 to 30).map { i =>
        val k = rnd.nextInt(260).toLong + 1 // may or may not exist
        val p = (rnd.nextInt(6) + 1).toString // partitions 1..6 (6 is new)
        val del = rnd.nextInt(4) == 0
        (k, rnd.nextInt(100000).toLong, p, if (del) "D" else "U", i.toLong)
      }
      MergeSink.mergeInto(spark, dir,
        rows.toDF("k", "price_cents", "prio", "op", "seq"), Seq("k"), "prio")
      // reference: last op per (k, p) by seq wins within the batch
      rows.groupBy(r => (r._1, r._3)).foreach { case ((k, p), ops) =>
        val last = ops.maxBy(_._5)
        if (last._4 == "D") ref.remove((k, p)) else ref((k, p)) = last._2
      }
      val state = spark.read.parquet(dir)
        .select($"k", $"prio".cast("string"), $"price_cents").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(state == ref.toMap, s"batch $batch diverged from reference")
    }
  }

  test("emptied-dir cleanup handles escaped partition values (: = % etc.)") {
    // Spark escapes reserved chars in partition dir names ('a:b' →
    // 'a%3Ab'); cleanup by raw value would miss the directory and
    // resurrect the deleted rows on the next read.
    val dir = writeBase()
    MergeSink.mergeInto(spark, dir,
      Seq((9000L, 1L, "a:b=c", "U", 1L))
        .toDF("k", "price_cents", "prio", "op", "seq"),
      Seq("k"), "prio")
    val escaped = new java.io.File(dir, "prio=a%3Ab%3Dc")
    assert(escaped.exists(), s"escaped partition dir written: " +
      new java.io.File(dir).listFiles().map(_.getName).mkString(","))
    MergeSink.mergeInto(spark, dir,
      Seq((9000L, 0L, "a:b=c", "D", 1L))
        .toDF("k", "price_cents", "prio", "op", "seq"),
      Seq("k"), "prio")
    assert(!escaped.exists(), "escaped partition dir removed after full delete")
    assert(readState(dir).size == 200)
  }

  test("null partition value in changes is rejected up front") {
    val dir = writeBase()
    val err = intercept[IllegalArgumentException] {
      MergeSink.mergeInto(spark, dir,
        Seq((1L, 5L, null: String, "U", 1L))
          .toDF("k", "price_cents", "prio", "op", "seq"),
        Seq("k"), "prio")
    }
    assert(err.getMessage.contains("non-null"), err.getMessage)
  }

  test("targetSeqCol: conditional merge is microbatch-order independent") {
    // version column `ver` stored as payload; two single-row batches for the
    // same key applied NEWEST-FIRST must leave the newest value in place —
    // the shape a file-source CDC stream hits when microbatch boundaries
    // don't respect event order.
    def freshDir(): String = {
      val dir = Files.createTempDirectory("graft_merge_seq").toString + "/t"
      Seq((1L, 10L, 100L, "1"), (2L, 20L, 100L, "1"))
        .toDF("k", "cents", "ver", "prio")
        .write.partitionBy("prio").mode("overwrite").parquet(dir)
      dir
    }
    def batch(cents: Long, ver: Long) =
      Seq((1L, cents, ver, "1", "U", ver))
        .toDF("k", "cents", "ver", "prio", "op", "seq")
    def state(dir: String): Map[Long, (Long, Long)] =
      spark.read.parquet(dir).select($"k", $"cents", $"ver").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // order A: old then new
    val dirA = freshDir()
    MergeSink.mergeInto(spark, dirA, batch(111L, 200L), Seq("k"), "prio",
      targetSeqCol = Some("ver"))
    MergeSink.mergeInto(spark, dirA, batch(222L, 300L), Seq("k"), "prio",
      targetSeqCol = Some("ver"))
    // order B: new then old — the old batch must NOT overwrite
    val dirB = freshDir()
    MergeSink.mergeInto(spark, dirB, batch(222L, 300L), Seq("k"), "prio",
      targetSeqCol = Some("ver"))
    MergeSink.mergeInto(spark, dirB, batch(111L, 200L), Seq("k"), "prio",
      targetSeqCol = Some("ver"))

    assert(state(dirA) == state(dirB))
    assert(state(dirA)(1L) == ((222L, 300L)))
    assert(state(dirA)(2L) == ((20L, 100L)))
    // default (unconditional) mode keeps last-writer-wins semantics
    val dirC = freshDir()
    MergeSink.mergeInto(spark, dirC, batch(222L, 300L), Seq("k"), "prio")
    MergeSink.mergeInto(spark, dirC, batch(111L, 200L), Seq("k"), "prio")
    assert(state(dirC)(1L) == ((111L, 200L)))
  }

  test("empty change batch is a no-op") {
    val dir = writeBase()
    val before = (1 to 5).map(p => p.toString -> stamps(dir, p.toString)).toMap
    val st = MergeSink.mergeInto(spark, dir,
      Seq.empty[(Long, Long, String, String, Long)]
        .toDF("k", "price_cents", "prio", "op", "seq"),
      Seq("k"), "prio")
    assert(st.partitionsRewritten.isEmpty && st.rowsWritten == 0L)
    (1 to 5).foreach(p =>
      assert(stamps(dir, p.toString) == before(p.toString)))
  }
}
