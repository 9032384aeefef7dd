package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark's native probabilistic structures over the testdata — the
  * broadcast-side membership / heavy-hitter tools a 100 TB pipeline uses
  * before any exact join (e.g. bloom-prune a fact scan against a filtered
  * dim, count-min heavy hitters without a full groupBy).
  */
class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bloom filter on customer keys: no false negatives, FPP within bound") {
    val cust = Tables.customer(spark, TestSpark.sfDir)
    val keys = cust.select($"c_custkey").as[Long].collect()
    val bf = cust.stat.bloomFilter("c_custkey", keys.length.toLong, 0.03)
    assert(keys.forall(bf.mightContain), "bloom filters never false-negative")
    // false-positive rate on keys guaranteed absent (shifted far out of range)
    val absent = (1 to 10000).map(i => 10_000_000L + i)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp <= 0.06, s"observed FPP $fp should be near the 3% target")
  }

  test("count-min sketch overestimates but never underestimates frequencies") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val cms = ev.stat.countMinSketch("event_type", eps = 0.005, confidence = 0.99,
      seed = 42)
    val exact = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"$k: CMS must not undercount ($est < $n)")
      assert(est <= n + (0.005 * cms.totalCount()).toLong + 1,
        s"$k: estimate $est outside eps bound of true $n")
    }
  }

  test("Misra-Gries heavy hitters: frequent keys survive, counters never overcount") {
    import org.apache.spark.sql.functions._
    // Key domain: part-key buckets over lineitem (skewed by construction
    // via mod) — k chosen so true heavy hitters clear the n/(k+1) bar.
    val keyed = Tables.lineitem(spark, TestSpark.sfDir)
      .select(($"l_partkey" % 7).as("key"))
    val n = keyed.count()
    val k = 5
    val sketch = keyed
      .agg(graft.plans.SpaceSavingAgg.heavyHitters($"key", k).as("hh"))
      .selectExpr("explode(hh) AS h").select($"h.key", $"h.cnt")
      .as[(Long, Long)].collect().toMap
    val exact = keyed.groupBy($"key").count().as[(Long, Long)].collect().toMap
    val bar = n / (k + 1)
    exact.filter(_._2 > bar).keys.foreach { key =>
      assert(sketch.contains(key), s"true heavy hitter $key (> n/(k+1)) must survive")
    }
    sketch.foreach { case (key, c) =>
      val t = exact.getOrElse(key, 0L)
      assert(c <= t, s"$key: MG counter must not overcount ($c > $t)")
      assert(c >= t - bar, s"$key: undercount beyond n/(k+1) bound ($c < $t - $bar)")
    }
    // mergeability: the bound must hold regardless of partial layout
    val sk2 = keyed.repartition(17)
      .agg(graft.plans.SpaceSavingAgg.heavyHitters($"key", k).as("hh"))
      .selectExpr("explode(hh) AS h").select($"h.key", $"h.cnt")
      .as[(Long, Long)].collect().toMap
    exact.filter(_._2 > bar).keys.foreach { key =>
      assert(sk2.contains(key), s"heavy hitter $key must survive any partitioning")
    }
    sk2.foreach { case (key, c) =>
      val t = exact.getOrElse(key, 0L)
      assert(c <= t && c >= t - bar, s"$key: merged-sketch bound violated")
    }
  }
}
