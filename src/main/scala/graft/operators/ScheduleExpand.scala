package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's central operator (SURVEY §2-G1), as a reusable library
  * transform on the native flight-schedule shape: expand each recurring
  * schedule row (validity date range + day1..day7 operating flags, day1 =
  * Monday per the Innovata convention) into one row per concrete operating
  * date.
  *
  * Spark-first design: a declarative `explode(sequence(...))` generator +
  * day-flag filter. No shuffle, fully pipelined inside whole-stage codegen,
  * embarrassingly parallel per input split — the shape that survives 100 TB
  * (the reference does this row-at-a-time in a single process).
  */
object ScheduleExpand {

  /** Monday=0 weekday of a date column (dayofweek is Sunday=1). */
  def weekdayMon0(dateCol: Column): Column = (dayofweek(dateCol) + lit(5)) % 7

  /** Expand `df` on [effectiveCol, discontinuedCol] (inclusive) keeping
    * dates whose Monday-first day flag is true. Adds `dateCol`. */
  def expand(df: DataFrame, effectiveCol: String, discontinuedCol: String,
             dayFlagCols: Seq[String], dateCol: String = "flightDate"): DataFrame = {
    require(dayFlagCols.length == 7, "need exactly 7 day-of-week flag columns")
    val flags = array(dayFlagCols.map(col): _*)
    df.withColumn(dateCol,
        explode(sequence(col(effectiveCol), col(discontinuedCol))))
      .where(element_at(flags, (weekdayMon0(col(dateCol)) + lit(1)).cast("int")))
  }

  /** Mask variant: bit k of `maskCol` (Monday=0) set → the schedule
    * operates on that weekday. Used by the graded G1 query. */
  def expandMask(df: DataFrame, effectiveCol: String, discontinuedCol: String,
                 maskCol: String, dateCol: String = "flightDate"): DataFrame =
    df.withColumn(dateCol,
        explode(sequence(col(effectiveCol), col(discontinuedCol))))
      .where(expr(s"shiftright($maskCol, (dayofweek($dateCol) + 5) % 7) % 2 = 1"))
}
