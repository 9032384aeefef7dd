package graft

import java.nio.file.Files
import graft.sources.VersionedTable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE ADD COLUMNS over graftvt catalog tables: metadata-only
  * schema-evolution commit, null backfill for pre-evolution files, catalog
  * schema sync, time travel across the evolve, checkpoint survival, and
  * the non-graftvt fallthrough. */
class GraftVtAlterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val orig = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(orig)
    SparkSession.setActiveSession(orig)
    s
  }

  private def newTable(prefix: String, name: String): String = {
    val dir = Files.createTempDirectory(prefix).toString + "/t"
    import spark.implicits._
    val rows = Seq((1L, 10L, "p0"), (2L, 20L, "p1")).toDF("k", "v", "p")
    VersionedTable.create(spark, dir, rows, "p")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graftvt " +
      s"OPTIONS (path '$dir', partitionCol 'p')")
    dir
  }

  test("ADD COLUMNS is metadata-only; old rows read null; inserts fill") {
    val dir = newTable("graft_alt_a", "vt_alt_a")
    val r = spark.sql(
      "ALTER TABLE vt_alt_a ADD COLUMNS (note STRING, score BIGINT)").head()
    assert(r.getInt(0) == 1 && r.getString(1) == "note,score", r.toString)
    // metadata-only: the evolve commit added zero data files
    assert(VersionedTable.liveEntries(spark, dir, 1)
      .forall(_.version == 0), "evolve must reference no data file")
    // pre-evolution rows read null in the new columns, via catalog SQL
    val got = spark.sql(
      "SELECT k, v, note, score FROM vt_alt_a ORDER BY k").collect()
    assert(got.length == 2 && got.forall(g => g.isNullAt(2) && g.isNullAt(3)))
    // an INSERT carrying the new columns lands and reads back typed
    spark.sql("INSERT INTO vt_alt_a VALUES (3, 30, 'p0', 'x', 7)")
    val k3 = spark.sql(
      "SELECT note, score FROM vt_alt_a WHERE k = 3").head()
    assert(k3.getString(0) == "x" && k3.getLong(1) == 7L)
    // mixed-vintage aggregate over old + new files
    assert(spark.sql("SELECT count(score) FROM vt_alt_a").head().getLong(0)
      == 1L)
    spark.sql("DROP TABLE vt_alt_a")
  }

  test("time travel below the evolve keeps the narrow schema") {
    val dir = newTable("graft_alt_tt", "vt_alt_tt")
    spark.sql("ALTER TABLE vt_alt_tt ADD COLUMNS (note STRING)")
    assert(!VersionedTable.read(spark, dir, 0).columns.contains("note"))
    assert(VersionedTable.read(spark, dir, 1).columns.contains("note"))
    assert(spark.sql("SELECT * FROM vt_alt_tt VERSION AS OF 0")
      .columns.sameElements(Array("k", "v", "p")))
    // DESCRIBE HISTORY names the operation
    val ops = spark.sql("DESCRIBE HISTORY vt_alt_tt")
      .select("operation").collect().map(_.getString(0)).sorted.toSeq
    assert(ops == Seq("add_columns", "create"), ops.toString)
    spark.sql("DROP TABLE vt_alt_tt")
  }

  test("the evolve survives checkpoint replay") {
    val dir = newTable("graft_alt_ck", "vt_alt_ck")
    spark.sql("ALTER TABLE vt_alt_ck ADD COLUMNS (note STRING)")
    import spark.implicits._
    VersionedTable.appendCommit(spark, dir,
      Seq((3L, 30L, "p0", "y")).toDF("k", "v", "p", "note"), "p")
    VersionedTable.checkpoint(spark, dir, 2)
    // a replay FROM the checkpoint must still see the widened schema
    val df = VersionedTable.read(spark, dir, 2)
    assert(df.columns.contains("note"))
    assert(df.filter($"k" === 3L).select("note").head().getString(0) == "y")
    assert(df.filter($"k" === 1L).select("note").head() == null ||
      df.filter($"k" === 1L).select("note").head().isNullAt(0))
    spark.sql("DROP TABLE vt_alt_ck")
  }

  test("duplicate or existing columns are rejected; non-graftvt untouched") {
    newTable("graft_alt_e", "vt_alt_e")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE vt_alt_e ADD COLUMNS (v BIGINT)")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // a parquet catalog table keeps Spark's own ALTER path
    val pdir = Files.createTempDirectory("graft_alt_pq").toString + "/t"
    import spark.implicits._
    Seq((1, "a")).toDF("id", "s").write.parquet(pdir)
    spark.sql("DROP TABLE IF EXISTS alt_plain_pq")
    spark.sql(s"CREATE TABLE alt_plain_pq USING parquet LOCATION '$pdir'")
    spark.sql("ALTER TABLE alt_plain_pq ADD COLUMNS (extra INT)")
    assert(spark.table("alt_plain_pq").columns.contains("extra"))
    spark.sql("DROP TABLE alt_plain_pq")
    spark.sql("DROP TABLE vt_alt_e")
  }
}
