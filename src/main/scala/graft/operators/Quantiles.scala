package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact quantiles without full-group sorts.
  *
  * Two complementary evaluation strategies, both exact:
  *  - bounded value domain → pure histogram (see agg_median_exact /
  *    agg_mad_exact in [[Aggregates]]): hash-agg the value counts, scan
  *    the tiny histogram.
  *  - unbounded domain → two-phase bucket refine ([[weightedMedian]]):
  *    pass 1 hash-aggregates weight per width-`bucketWidth` value bucket
  *    and locates the threshold bucket per group (tiny window), pass 2
  *    sorts ONLY that bucket's rows after a broadcast join. The full-group
  *    sort — the dominant cost at scale — shrinks to ~1/buckets of the
  *    data. This is the classic distributed-median refinement; it applies
  *    to any rank statistic by changing the threshold predicate.
  */
object Quantiles {

  /** Exact weighted median per group: smallest `value` v with
    * 2·Σ weight(rows with value ≤ v) ≥ Σ weight. Ties are safe: a run of
    * equal values qualifies iff its end-of-run cumulative crosses the
    * threshold, so min-over-qualifying is order-independent. Monotonicity
    * of truncating division makes the bucketing order-preserving for
    * negative values too.
    *
    * Input columns: `group` (any type), `value`/`weight` BIGINT, weights
    * non-negative with a positive group sum. Output: (group, wmedian).
    */
  def weightedMedian(base: DataFrame, group: String, value: String,
                     weight: String, bucketWidth: Long): DataFrame = {
    val byGroup = Window.partitionBy(col("__g"))
    val b = base.select(col(group).as("__g"), col(value).as("__v"),
      col(weight).as("__w"))
    val marks = b
      .withColumn("__bkt", expr(s"__v div $bucketWidth"))
      .groupBy(col("__g"), col("__bkt")).agg(sum(col("__w")).as("w"))
      .withColumn("cumEnd", sum(col("w")).over(byGroup.orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("w")).over(byGroup))
      .filter(col("cumEnd") * 2 >= col("tot"))
      .withColumn("rk", row_number().over(byGroup.orderBy(col("__bkt"))))
      .filter(col("rk") === 1)
      .select(col("__g").as("__mg"), col("__bkt").as("__tb"),
        (col("cumEnd") - col("w")).as("__carry"), col("tot").as("__tot"))
    b
      .withColumn("__bkt", expr(s"__v div $bucketWidth"))
      .join(broadcast(marks),
        col("__g") === col("__mg") && col("__bkt") === col("__tb"))
      .withColumn("__cumIn", sum(col("__w")).over(byGroup.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter((col("__carry") + col("__cumIn")) * 2 >= col("__tot"))
      .groupBy(col("__g").as(group))
      .agg(min(col("__v")).as("wmedian"))
  }
}
