package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.AnalysisException

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
        // Second arg must fold to an integer constant: the sketch width is a
        // plan-time constant, not a per-row value. Accept INT/BIGINT/SMALLINT
        // (including under foldable casts); anything else is a clean
        // AnalysisException instead of a ClassCastException/NPE.
        def bad(detail: String) = new AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" ->
            s"minhash_sketch: nHashes must be an integer literal, got $detail"))
        val arg = exprs(1)
        if (!arg.foldable) throw bad(s"non-constant expression ${arg.sql}")
        val n = arg.eval() match {
          case i: Int   => i
          case l: Long  => l.toInt
          case s: Short => s.toInt
          case b: Byte  => b.toInt
          case other => throw bad(
            s"${arg.sql} of type ${arg.dataType.simpleString}" +
              (if (other == null) " (NULL)" else ""))
        }
        MinHashAgg(exprs.head, n).toAggregateExpression()
      }, "scala_udf")
  }
}
