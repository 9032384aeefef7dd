package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4's transformWithState — the successor to
  * flatMapGroupsWithState for arbitrary per-key state (named state
  * variables, TTL, timers), RocksDB-backed. One processor keeping a running
  * per-user total + event count proves the engine is current with the
  * API the reference's stateful consumers would migrate to.
  */
/** Running (total, n_events) per user; emits one row per key per batch.
  * Top-level (not nested in the suite) so the closure stays serializable. */
class GraftRunningTotal
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
  @transient private var total: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[(Long, Long)](
      "total", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timers: TimerValues): Iterator[(Long, Long, Long)] = {
    var (t, n) = if (total.exists()) total.get() else (0L, 0L)
    rows.foreach { r => t += r._2; n += 1 }
    total.update((t, n))
    Iterator.single((key, t, n))
  }
}

class TransformWithStateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("transformWithState keeps named per-key state across batches") {
    implicit val ctx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Long)] // (user_id, amount)
      val out = in.toDS()
        .groupByKey(_._1)
        .transformWithState(new GraftRunningTotal(), TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "total", "n")
        .writeStream.format("memory").queryName("graft_tws")
        .outputMode("update").start()
      try {
        in.addData((1L, 5L), (1L, 7L), (2L, 3L))
        q.processAllAvailable()
        in.addData((1L, 1L), (3L, 9L))
        q.processAllAvailable()
        val last = spark.table("graft_tws")
          .as[(Long, Long, Long)].collect()
          .groupBy(_._1).map { case (k, vs) => k -> vs.last }
        // user 1: 5+7 in batch 1, +1 in batch 2 → (13, 3); state survived
        assert(last(1L) == ((1L, 13L, 3L)), s"user1: ${last(1L)}")
        assert(last(2L) == ((2L, 3L, 1L)))
        assert(last(3L) == ((3L, 9L, 1L)))
      } finally q.stop()
    } finally {
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("CEP funnel completes across microbatches; window and order enforced") {
    implicit val ctx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val H = 3600000000L // 1h in µs
      val in = MemoryStream[(Long, Long, Long, String)]
      val out = in.toDS()
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.CepFunnel(),
          TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "n_purchases", "n_funnels")
        .writeStream.format("memory").queryName("graft_cep_multi")
        .outputMode("update").start()
      try {
        // user 1: click / view / purchase arrive in THREE different
        // batches, within 6h — must complete via persisted DP registers.
        // user 2: purchase 10h after the click — window must reject it.
        // user 3: view BEFORE click, then purchase — order must reject.
        in.addData((1L, 0L, 1L, "click"), (2L, 0L, 2L, "click"),
          (3L, 0L, 3L, "view"))
        q.processAllAvailable()
        in.addData((1L, H, 4L, "view"), (2L, H, 5L, "view"),
          (3L, H, 6L, "click"))
        q.processAllAvailable()
        in.addData((1L, 2 * H, 7L, "purchase"), (2L, 10 * H, 8L, "purchase"),
          (3L, 2 * H, 9L, "purchase"))
        q.processAllAvailable()
        val last = spark.table("graft_cep_multi")
          .as[(Long, Long, Long)].collect()
          .groupBy(_._1).map { case (k, vs) => k -> vs.last }
        assert(last(1L) == ((1L, 1L, 1L)), s"cross-batch funnel: ${last(1L)}")
        assert(last(2L) == ((2L, 1L, 0L)), s"6h window: ${last(2L)}")
        assert(last(3L) == ((3L, 1L, 0L)), s"strict order: ${last(3L)}")
      } finally q.stop()
    } finally {
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
