package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Cross-engine fuzz gate: execute generated shared-dialect SQL
  * (tools/fuzz_gen.py) with spark.sql over the testdata views, dump each
  * result + an oracle_sql.json echoing the same SQL, so
  * tools/check_oracle.py can hash-compare against DuckDB. Catches dialect
  * or planner divergences the fixed query set doesn't reach.
  *
  * Usage: runMain graft.FuzzVerify <sfDir> <sqlTsv> <outDir>
  */
object FuzzVerify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sqlTsv, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The band-join fuzz template relies on the rewrite to stay O(n·c);
    // DuckDB's IEJoin runs the identical SQL on the oracle side.
    graft.plans.RangeJoinRewrite.install(spark)
    Seq("orders", "lineitem", "customer").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    new java.io.File(outDir).mkdirs()
    val entries = Files.readAllLines(Paths.get(sqlTsv)).asScala
      .filter(_.nonEmpty).map { line =>
        val Array(name, sql) = line.split("\t", 2)
        name -> sql
      }
    entries.foreach { case (name, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[fuzz] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\t' => "\\t"; case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      entries.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
