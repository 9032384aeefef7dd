package graft.plans

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom Catalyst pieces, so
  * `spark.sql` users get them by name:
  *
  *   SELECT vec_dot(a, b)                  -- codegen'd dot-product fold
  *   SELECT minhash_sketch(hash_col, 16)   -- MinHash sketch aggregate
  *
  * Registered per-session via the function registry (runtime-registrable
  * on the driver harness's pre-built session; a from-scratch deployment
  * would wire the same through SparkSessionExtensions.injectFunction).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot",
      exprs => DotFold(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("minhash_sketch",
      exprs => {
        val n = exprs(1).eval(null).asInstanceOf[Int]
        MinHashAgg(exprs.head, n).toAggregateExpression()
      }, "scala_udf")
  }
}
