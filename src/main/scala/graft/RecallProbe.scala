package graft
import org.apache.spark.sql.SparkSession
import graft.functions.AnnSearch

/** Dev diagnostic (not part of the engine surface): prints recall@20 vs the
  * exact scan for single-probe LSH (4 and 12 tables) and multi-probe LSH
  * (4 tables) at the corpus auto width, per sf directory argument. The
  * numbers quoted in FunctionsSpec's multi-probe test come from this. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- dirs) {
      val e = Tables.embeddings(spark, dir)
      val n = e.count()
      val nb = AnnSearch.autoBits(n)
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
      val exact = AnnSearch.cosineTopK(e.filter($"vec_id" =!= 0), q, 20)
        .select($"vec_id").as[Long].collect().toSet
      def r(df: org.apache.spark.sql.DataFrame) = {
        val g = df.select($"vec_id").as[Long].collect().toSet
        (exact intersect g).size.toDouble / exact.size
      }
      val s4  = r(AnnSearch.annTopK(e.filter($"vec_id" =!= 0), q, 20, 64, nb, 4))
      val s12 = r(AnnSearch.annTopK(e.filter($"vec_id" =!= 0), q, 20, 64, nb, 12))
      val m4  = r(AnnSearch.annTopKMulti(e.filter($"vec_id" =!= 0), q, 20, 64, nb, 4))
      println(s"[recall] dir=$dir n=$n nb=$nb single4=$s4 single12=$s12 multi4=$m4")
    }
    spark.stop()
  }
}
