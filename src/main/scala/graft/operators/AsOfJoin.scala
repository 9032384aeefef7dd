package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (§2-C12) as a SINGLE-SHUFFLE union + window rewrite.
  *
  * The naive form — `left JOIN right ON key AND right.ts < left.ts` then
  * `MAX(right.ts)` per left row — explodes quadratically per key (every
  * probe row pairs with every prior event) and costs two shuffles. This
  * rewrite is the scale-correct shape:
  *
  *   1. tag both inputs and UNION them (no shuffle);
  *   2. one hash shuffle on the key, sort within partition by ts;
  *   3. `last(right_ts, ignoreNulls)` over a RANGE frame ending 1 tick
  *      before the current row = the most recent STRICTLY prior right-side
  *      event — streaming, O(n log n), no row explosion;
  *   4. keep the left rows.
  *
  * The range frame (not rows) makes the strict `<` exact even when ts
  * values collide. Equivalent to Pandas merge_asof / DuckDB ASOF JOIN with
  * strict inequality.
  */
object AsOfJoin {

  /** `left` rows + `asof_ts`: the greatest `tsCol` of a `right` row with
    * the same `keyCol` and `right.ts < left.ts` (BIGINT tick domain). */
  def asOfPrior(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                outCol: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__is_left", lit(1))
      .withColumn("__r_ts", lit(null).cast("long"))
    val r = right.select(col(keyCol), col(tsCol)).withColumn("__is_left", lit(0))
      .withColumn("__r_ts", col(tsCol))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
      .rangeBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn(outCol, last(col("__r_ts"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select((leftCols.map(col) :+ col(outCol)): _*)
  }

  /** Tolerance variant: the match must additionally be within `maxGap`
    * ticks (`left.ts - asof_ts <= maxGap`), else null. */
  def asOfPriorWithin(left: DataFrame, right: DataFrame, keyCol: String,
                      tsCol: String, maxGap: Long, outCol: String = "asof_ts"): DataFrame =
    asOfPrior(left, right, keyCol, tsCol, outCol)
      .withColumn(outCol,
        when(col(tsCol) - col(outCol) <= maxGap, col(outCol)).otherwise(lit(null).cast("long")))
}
