package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured demo for the codegen WinnowFp expression (not part of the
  * graded registry): winnowing fingerprints (k=8, w=4) for a synthetic
  * corpus via (a) the relational form — explode one row per character
  * position, two doc-partitioned window functions, distinct — and (b)
  * the native codegen expression — one scalar pass per document. Both
  * sides aggregate (count + xor of fingerprint hashes) so the comparison
  * measures extraction throughput, not collect. Corpus: 400k docs × ~200
  * chars (≈77M k-gram positions — the row count the relational form must
  * materialize and sort twice). Prints one JSON line; numbers recorded
  * in SCALING.md. Run: sbt "runMain graft.WinnowBench".
  */
object WinnowBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = 400000L
    // Deterministic pseudo-text: 40 tokens of 4 hex chars each per doc.
    val docs = spark.range(nDocs).select($"id".as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 39),
             |  i -> substring(md5(cast(id * 40 + i as string)), 1, 4)))"""
        .stripMargin).as("text"))

    def time(body: => (Long, Long)): (Double, (Long, Long)) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def agg(fp: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = fp.agg(count(lit(1)), sum(expr("h % 1000003"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def relational = agg(operators.TextOps.winnowFingerprintsRelational(docs))
    def expression = agg(operators.TextOps.winnowFingerprints(docs))

    time(expression) // warm codegen + scan
    val (rSec, rRes) = time(relational)
    val (eSec, eRes) = time(expression)
    require(rRes == eRes, s"checksum mismatch: $rRes vs $eRes")
    println(f"""{"relational_sec":$rSec%.2f,"expr_sec":$eSec%.2f,""" +
      f""""n_fp":${eRes._1},"checksum":${eRes._2}}""")
    spark.stop()
  }
}
