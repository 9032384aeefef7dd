package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) bit interleave of two
  * BIGINT bucket values over `bits` low bits each —
  * `Σ_k ((x>>k)&1)<<(2k) | ((y>>k)&1)<<(2k+1)`.
  *
  * Replaces the `aggregate(sequence(0, bits-1), ...)` higher-order fold in
  * `etl_zorder_key`: the HOF path materializes the index array and a
  * lambda frame per row; this compiles to a tight shift/mask loop inside
  * whole-stage codegen — the per-row cost that matters when z-ordering a
  * 100 TB write. Semantics are bit-identical to the HOF form and to the
  * oracle's `<<`/`>>` SQL, so the unchanged DuckDB oracle doubles as a
  * cross-implementation proof.
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits > 0 && bits <= 31, "bits must be in 1..31")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"MortonInterleave needs two BIGINT inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var acc = 0L
    var k = 0
    while (k < bits) {
      acc |= ((x >> k) & 1L) << (2 * k)
      acc |= ((y >> k) & 1L) << (2 * k + 1)
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $k = 0; $k < $bits; $k++) {
         |  $acc |= (($a >> $k) & 1L) << (2 * $k);
         |  $acc |= (($b >> $k) & 1L) << (2 * $k + 1);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** `morton(x, y, bits)` over two BIGINT bucket columns. */
  def morton(x: Column, y: Column, bits: Int): Column =
    ColumnShim.column(
      MortonInterleave(ColumnShim.expression(x), ColumnShim.expression(y), bits))
}
