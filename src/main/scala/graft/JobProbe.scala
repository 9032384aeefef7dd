package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query Spark-job accounting: how many jobs a registered query
  * launches and where the wall-clock goes (jobs vs driver-side gaps).
  * Optimization-round diagnostic only — not part of the driver contract. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id % 7)").count()
    case class J(id: Int, desc: String, start: Long, var end: Long)
    val jobs = mutable.ArrayBuffer.empty[J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs += J(e.jobId, d, e.time, -1)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = e.time)
      }
    })
    for (round <- 1 to 2; n <- names) {
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      jobs.synchronized {
        val tot = jobs.filter(_.end > 0).map(j => j.end - j.start).sum / 1e3
        println(f"[probe] r$round $n total=$dt%.2fs jobs=${jobs.size} jobtime=$tot%.2fs")
        if (round == 2) {
          jobs.foreach(j => println(f"[probe]   job${j.id}%4d ${(j.end - j.start) / 1e3}%6.2fs  ${j.desc.take(110)}"))
        }
      }
    }
    spark.stop()
  }
}
