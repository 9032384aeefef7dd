package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: per-query wall seconds + bytes spilled + max per-task
  * peak execution memory, for one named query on one sf dir. */
object PeakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          peak.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
        }
      }
    })
    for (n <- args(1).split(",")) {
      SparkEntry.queries(n)(spark, args(0)).count() // warm
      spilled.set(0); peak.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, args(0)).count()
      println(f"[peak] $n ${(System.nanoTime()-t0)/1e9}%.2f s spill=${spilled.get/1e6}%.1f MB peak=${peak.get/1e6}%.1f MB")
    }
    spark.stop()
  }
}
