package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup invariants (G2 idempotence, §2-D9 approx distinct bounds, J6
  * MinHash behaviour vs exact Jaccard). */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("G2 dedup-last-wins is idempotent and key-unique") {
    val q = SparkEntry.queries("etl_dedup_lastwins")
    val once = q(spark, TestSpark.sfDir)
    val keys = once.select($"user_id", $"event_type")
    assert(keys.distinct().count() == once.count(), "one row per natural key")
    // applying the same window-dedup to its own output is a fixpoint
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"ts_us".desc, $"event_id".desc)
    val twice = once.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    assert(twice.count() == once.count())
  }

  test("D9: approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val exact = ev.select(countDistinct($"user_id")).as[Long].head()
    val approx = ev.select(approx_count_distinct($"user_id", 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"approx=$approx exact=$exact")
  }

  test("approx_percentile tracks the exact rank-based median") {
    val exact = SparkEntry.queries("agg_median_exact")(spark, TestSpark.sfDir)
      .select($"l_returnflag", $"med_lo_cents").as[(String, Long)].collect().toMap
    val approx = Tables.lineitem(spark, TestSpark.sfDir)
      .select($"l_returnflag", round($"l_quantity" * 100).cast("long").as("x"))
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"x", lit(0.5), lit(1000)).as("p50"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (flag, med) =>
      val p = approx(flag)
      assert(math.abs(p - med).toDouble / med <= 0.05,
        s"$flag: approx $p vs exact $med")
    }
  }

  test("J6: MinHash signature agreement tracks exact Jaccard") {
    // near-identical docs (one token edited) vs an unrelated doc
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "EDIT" else s"tok$i").mkString(" ")
    val far = (100 to 160).map(i => s"other$i").mkString(" ")
    val docs = Seq((0L, base), (1L, near), (2L, far)).toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_minhash_docs")
    val sig = spark.sql(
      """SELECT doc_id, j,
        |  MIN((CAST(conv(substring(md5(CAST(sh AS BINARY)), 1, 8), 16, 10) AS BIGINT)
        |       * (2 * j + 1) + 7 * j + 3) % 2147483647) AS mh
        |FROM (
        |  SELECT doc_id, explode(array_distinct(transform(
        |    sequence(0, size(split(text, ' ')) - 3),
        |    i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))) AS sh
        |  FROM graft_minhash_docs) t
        |LATERAL VIEW explode(sequence(0, 15)) ex AS j
        |GROUP BY doc_id, j""".stripMargin)
    val matches = sig.as("a").join(sig.as("b"),
        col("a.j") === col("b.j") && col("a.mh") === col("b.mh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .map { case (d1, d2, n) => (d1, d2) -> n }.toMap
    val nearMatches = matches.getOrElse((0L, 1L), 0L)
    val farMatches = math.max(matches.getOrElse((0L, 2L), 0L), matches.getOrElse((1L, 2L), 0L))
    assert(nearMatches >= 8, s"near-dup pair should agree on most hashes, got $nearMatches/16")
    assert(farMatches <= 2, s"unrelated pair should rarely agree, got $farMatches/16")
  }

  test("shingle queries survive documents with fewer than 3 tokens") {
    // sequence(0, size-3) descends through -1 for short docs and
    // slice(t, 0, 3) throws — the guarded shingle template must instead
    // yield no shingles (matching the oracle's generate_subscripts range).
    val dir = java.nio.file.Files.createTempDirectory("graft_short_docs").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "EDIT" else s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "t", base.length.toLong),
      (1L, near, "en", "t", near.length.toLong),
      (2L, "one", "en", "t", 3L),
      (3L, "two words", "en", "t", 9L),
      (4L, "", "en", "t", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).collect()
    assert(jac.nonEmpty, "near-dup docs 0/1 should still pair")
    val kept = SparkEntry.queries("dedup_corpus_keep")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(Set(2L, 3L, 4L).subsetOf(kept), "short docs pass through unharmed")
    // minhash path: short docs contribute no signatures, no crash
    SparkEntry.queries("dedup_minhash_pairs")(spark, dir).collect()
  }
}
