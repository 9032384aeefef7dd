package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures CountMinAgg's claim: per-group point-frequency state whose
  * shuffle cost is INDEPENDENT of key cardinality.
  *
  * Three ways to answer "how often does key k occur in group g":
  *  - exact: groupBy(g, key).count — shuffles one row per DISTINCT
  *    (g, key); at high key cardinality this is the dominant cost and at
  *    100 TB it is a full re-shuffle of the key domain;
  *  - relational CMS: explode the 4 hash rows and groupBy(g, j, cell) —
  *    correct matrix, but 4× the input rows into the shuffle (bounded by
  *    4·w per group after partial agg);
  *  - CountMinAgg: one pass, one 4·w-cell matrix per group through the
  *    shuffle, merge = elementwise add.
  *
  * Run: `sbt "runMain graft.CmsBench [n] [groups]"`.
  */
object CmsBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 32000000L
    val groups = if (args.length > 1) args(1).toInt else 64
    val w = 256
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~n/32 distinct keys, skewed: 10% of rows hit 100 hot keys
    val df = spark.range(n).select(
      ($"id" % groups).as("g"),
      when($"id" % 10 === 0, $"id" % 100)
        .otherwise(hash($"id").cast("long") % (n / 32)).as("key"))
      .localCheckpoint()
    val hx = md5(concat(lit("cms:"), $"key".cast("string")).cast("binary"))

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val (tAgg, nAgg) = timed {
      df.groupBy($"g")
        .agg(plans.CountMinAgg.cmsSketch(hx, 4, w).as("sk"))
        .count()
    }
    val (tRel, nRel) = timed {
      df.select($"g", hx.as("hx"))
        .select($"g", explode(array((0 until 4).map(lit): _*)).as("j"), $"hx")
        .select($"g", $"j",
          (conv(substring($"hx", $"j" * 8 + 1, lit(8)), 16, 10).cast("long") % w).as("cell"))
        .groupBy($"g", $"j", $"cell").count()
        .count()
    }
    val (tExact, nExact) = timed {
      df.groupBy($"g", $"key").count().count()
    }

    println(f"[cmsbench] n=$n groups=$groups w=$w " +
      f"cms_agg=$tAgg%.2f s ($nAgg sketch rows) " +
      f"relational=$tRel%.2f s ($nRel cell rows) " +
      f"exact_groupby=$tExact%.2f s ($nExact key rows) " +
      f"agg_vs_exact=${tExact / tAgg}%.1fx")
    spark.stop()
  }
}
