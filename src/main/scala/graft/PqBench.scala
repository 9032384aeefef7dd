package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured demo for the IVF-PQ candidate-ranking claim (not part of the
  * graded registry): rank 8M 64-dim vectors against one query via
  * (a) the raw layout — ARRAY<FLOAT>[64] per row, exact dot through the
  *     codegen DotFold (the in-list scan sim_ann_ivf performs), and
  * (b) the PQ layout — 8 TINYINT codes per row, approximate score as 8
  *     lookups into broadcast-literal 16-entry ADC tables (the in-list
  *     scan sim_ann_ivf_pq performs; packed columns, the production
  *     storage form of the graded row's (id, sub, code) relation).
  * Both sides read their layout from parquet (so the measured gap
  * includes the 64×-smaller bytes-on-disk/in-cache advantage, which IS
  * the production point) and end in the same top-200 TakeOrdered. Codes
  * here are synthetic (cost of ADC ranking is value-independent; recall
  * equivalence is established by the graded row + FunctionsSpec, not
  * this bench). Prints one JSON line {raw_sec, pq_sec, raw_bytes,
  * pq_bytes}; numbers recorded in SCALING.md.
  * Run: sbt "runMain graft.PqBench".
  */
object PqBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 8000000L
    val dir = "/tmp/graft_pq_bench"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)

    // Deterministic synthetic corpus: 64 float dims mixed from (id, j),
    // plus 8 synthetic 4-bit codes per row.
    spark.range(n).select($"id",
        expr("transform(sequence(0, 63), j -> cast(pmod(hash(id, j), 1000000000) as float) / 1000000000.0)")
          .as("v"))
      .write.mode("overwrite").parquet(s"$dir/raw")
    spark.range(n).select(($"id" +:
        (0 until 8).map(j => pmod(hash($"id", lit(j + 100)), lit(16))
          .cast("tinyint").as(s"c$j"))): _*)
      .write.mode("overwrite").parquet(s"$dir/pq")

    val qv = (0 until 64).map(j => (j * 37 % 1000) / 1000.0)
    val adc = (0 until 8).map(j => (0 until 16).map(c => ((j * 31 + c * 17) % 1000) / 1000.0))

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def rawRank(): Long = {
      val q = array(qv.map(x => lit(x.toFloat)): _*)
      spark.read.parquet(s"$dir/raw")
        .select($"id", functions.AnnSearch.dot($"v", q).as("s"))
        .orderBy($"s".desc, $"id".asc).limit(200)
        .agg(sum($"id")).as[Long].head()
    }
    def pqRank(): Long = {
      val score = (0 until 8).map { j =>
        element_at(array(adc(j).map(lit): _*), col(s"c$j").cast("int") + 1)
      }.reduce(_ + _)
      spark.read.parquet(s"$dir/pq")
        .select($"id", score.as("s"))
        .orderBy($"s".desc, $"id".asc).limit(200)
        .agg(sum($"id")).as[Long].head()
    }

    rawRank(); pqRank() // warm
    val (rawS, rawK) = time(rawRank())
    val (pqS, pqK) = time(pqRank())
    def bytes(p: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    println(s"""{"n":$n,"raw_sec":$rawS,"pq_sec":$pqS,""" +
      s""""raw_bytes":${bytes(s"$dir/raw")},"pq_bytes":${bytes(s"$dir/pq")},""" +
      s""""raw_check":$rawK,"pq_check":$pqK}""")
    spark.stop()
  }
}
