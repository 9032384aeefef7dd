package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{CmsState, CountMinAgg}
import graft.plans.CountMinAgg.cmsSketch

/** Count-Min sketch AGGREGATE (plans/CountMinAgg). Spark's own
  * `stat.countMinSketch` (covered in SketchSpec) is an eager driver-side
  * action; this is the aggregate-expression form — usable per group, in
  * SQL, under streaming state, and mergeable across partitions — with
  * md5-slice hashes so a SQL oracle can rebuild the matrix exactly
  * (graded query `sketch_cms_freq`). The properties gated here are the
  * ones the estimator's contract rests on.
  */
class CmsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  private def hexOf(key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"cms:$key".getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def hexCol(c: org.apache.spark.sql.Column) =
    md5(concat(lit("cms:"), c.cast("string")).cast("binary"))

  private def estimateFrom(cells: Array[Long], key: String): Long = {
    val st = new CmsState(D, W)
    Array.copy(cells, 0, st.cells, 0, cells.length)
    st.estimate(hexOf(key))
  }

  test("CMS aggregate never undercounts any key; row mass is conserved") {
    val li = Tables.lineitem(spark, TestSpark.sfDir).select($"l_partkey")
    val n = li.count()
    val cells = li.agg(cmsSketch(hexCol($"l_partkey"), D, W))
      .as[Array[Long]].head()
    assert(cells.length == D * W)
    // every hash row received every increment exactly once
    (0 until D).foreach { j =>
      val rowMass = cells.slice(j * W, (j + 1) * W).sum
      assert(rowMass == n, s"row $j mass $rowMass != $n")
    }
    val exact = li.groupBy($"l_partkey").count().as[(Long, Long)].collect()
    exact.foreach { case (k, cnt) =>
      val est = estimateFrom(cells, k.toString)
      assert(est >= cnt, s"key $k: CMS undercounted ($est < $cnt)")
    }
  }

  test("merge is elementwise addition: any partition layout gives the bit-identical matrix") {
    val li = Tables.lineitem(spark, TestSpark.sfDir).select($"l_partkey")
    val one = li.repartition(1).agg(cmsSketch(hexCol($"l_partkey"), D, W))
      .as[Array[Long]].head()
    val many = li.repartition(13).agg(cmsSketch(hexCol($"l_partkey"), D, W))
      .as[Array[Long]].head()
    assert(one.sameElements(many))
  }

  test("per-group sketches: each group's estimate bounds its own exact count") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select($"l_returnflag", $"l_partkey")
    val sketches = li.groupBy($"l_returnflag")
      .agg(cmsSketch(hexCol($"l_partkey"), D, W).as("sk"))
      .as[(String, Array[Long])].collect().toMap
    val exact = li.groupBy($"l_returnflag", $"l_partkey").count()
      .as[(String, Long, Long)].collect()
    exact.foreach { case (flag, k, cnt) =>
      val est = estimateFrom(sketches(flag), k.toString)
      assert(est >= cnt, s"group $flag key $k: $est < $cnt")
    }
  }

  test("SQL surface matches the Column form; bad args fail analysis cleanly") {
    graft.plans.GraftFunctions.register(spark)
    Tables.lineitem(spark, TestSpark.sfDir).select($"l_partkey")
      .createOrReplaceTempView("cms_in")
    val viaSql = spark.sql(
      s"""SELECT cms_sketch(md5(cast(concat('cms:', cast(l_partkey as string))
         |as binary)), $D, $W) FROM cms_in""".stripMargin)
      .as[Array[Long]].head()
    val viaCol = spark.table("cms_in")
      .agg(cmsSketch(hexCol($"l_partkey"), D, W)).as[Array[Long]].head()
    assert(viaSql.sameElements(viaCol))
    val e = intercept[Exception] {
      spark.sql("SELECT cms_sketch(md5(cast(cast(l_partkey as string) as binary)), l_partkey, 64) FROM cms_in")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("streaming state across microbatches is bit-identical to the batch matrix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(20260813L)
    // 3 microbatches, 2 groups, skewed keys — additivity must make the
    // final streaming state EQUAL (not just ε-close to) the batch
    // sketch over the union, regardless of batch boundaries.
    val batches = Array.fill(3)(Array.fill(20000)(
      (rnd.nextInt(2).toLong, math.abs(rnd.nextLong()) % 500L)))
    val mem = MemoryStream[(Long, Long)]
    val agg = mem.toDF()
      .select($"_1".as("g"), $"_2".as("key"))
      .groupBy($"g")
      .agg(cmsSketch(hexCol($"key"), D, W).as("sk"))
    val q = agg.writeStream.format("memory").queryName("graft_cms_multi")
      .outputMode("complete").start()
    try {
      batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val streamed = spark.table("graft_cms_multi")
        .as[(Long, Array[Long])].collect().toMap
      val batch = batches.flatten.toSeq.toDF("g", "key")
        .groupBy($"g").agg(cmsSketch(hexCol($"key"), D, W).as("sk"))
        .as[(Long, Array[Long])].collect().toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (g, cells) =>
        assert(cells.sameElements(batch(g)),
          s"group $g: streaming matrix diverged from batch matrix")
      }
    } finally q.stop()
  }

  test("NULL keys are skipped, not counted") {
    val df = Seq(Some(1L), None, Some(1L), None, Some(2L)).toDF("k")
    val cells = df.agg(cmsSketch(
      when($"k".isNotNull, hexCol($"k")).otherwise(lit(null)), D, W))
      .as[Array[Long]].head()
    (0 until D).foreach { j =>
      assert(cells.slice(j * W, (j + 1) * W).sum == 3L,
        s"row $j must hold only the 3 non-null rows")
    }
    assert(estimateFrom(cells, "1") >= 2)
  }

  test("state serialization round-trips") {
    val st = new CmsState(D, W)
    Seq("a", "b", "a", "c").foreach(k => st.insert(hexOf(k)))
    val agg = CountMinAgg(
      org.apache.spark.sql.graftshim.ColumnShim.expression(lit("x")), D, W)
    val back = agg.deserialize(agg.serialize(st))
    assert(back.d == D && back.w == W && back.count == st.count)
    assert(back.cells.sameElements(st.cells))
    assert(back.estimate(hexOf("a")) >= 2)
  }
}
