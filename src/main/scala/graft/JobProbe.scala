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
    case class St(id: Int, name: String, start: Long, var end: Long, var tasks: Int)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages += St(e.stageInfo.stageId, e.stageInfo.name,
            System.currentTimeMillis(), -1, e.stageInfo.numTasks)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages.find(_.id == e.stageInfo.stageId).foreach(_.end =
            System.currentTimeMillis())
        }
    })
    for (round <- 1 to 2; n <- names) {
      jobs.synchronized(jobs.clear()); stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      jobs.synchronized {
        val tot = jobs.filter(_.end > 0).map(j => j.end - j.start).sum / 1e3
        println(f"[probe] r$round $n total=$dt%.2fs jobs=${jobs.size} jobtime=$tot%.2fs")
      }
      if (round == 2) stages.synchronized {
        stages.filter(s => s.end > 0 && s.end - s.start >= 100)
          .sortBy(s => -(s.end - s.start))
          .take(20)
          .foreach(s => println(
            f"[probe]   stage${s.id}%5d ${(s.end - s.start) / 1e3}%6.2fs ${s.tasks}%4dt  ${s.name.take(100)}"))
      }
    }
    spark.stop()
  }
}
