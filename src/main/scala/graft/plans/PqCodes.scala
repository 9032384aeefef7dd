package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `m` product-quantization codes of one vector in a single
  * expression: `value[s] = argmax_code 2·dot(v[s·dsub..], cw(s,code)) −
  * ‖cw(s,code)‖²`, ties to the lowest code id (codes are stored in
  * ascending id order and only a strictly greater score displaces the
  * running best — identical to the relational `max(struct(s, −code))`).
  *
  * Exists for the same reason as [[SignBuckets]]: the relational encode
  * joins every (vector, subspace) row against all `ksub` codewords —
  * n·m·ksub materialized rows through a fanout aggregate (410M at sf10
  * once autoKsub widens to 256; measured 113 s, per-row join overhead, not
  * FLOPs) — while this compiled triple loop keeps the encode pass
  * FLOP-bound inside whole-stage codegen at any codebook width.
  *
  * The TRAINED codebook rides in the expression as flat constant arrays
  * (≤ m·ksub·dsub ≈ 16k doubles ≈ 128 KB — the bounded, driver-collected
  * index-build artifact; shipped once per task, never per row). Subspaces
  * may hold fewer than ksub surviving codes (a Lloyd seed whose training
  * slice fled drops out), hence the per-subspace offset table. The math is
  * bit-identical to the relational form, so the DuckDB oracle SQL is
  * unchanged and the driver hash match is a cross-implementation proof
  * (AnnSpec additionally pins expression ≡ relational).
  */
case class PqCodes(child: Expression, m: Int, dsub: Int,
                   codeIds: Array[Long], subOffsets: Array[Int],
                   codeVecs: Array[Double], wn2: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"PqCodes needs array<float|double>, got $t")
    }

  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(v: ArrayData): ArrayData = {
    val isF = elemIsFloat
    val dim = m * dsub
    val n = math.min(dim, v.numElements())
    val x = new Array[Double](dim) // beyond-n stays 0.0 = the fold's no-op
    var i = 0
    while (i < n) {
      x(i) = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var best = Double.NegativeInfinity
      var bestCode = -1L
      var c = subOffsets(s)
      val end = subOffsets(s + 1)
      while (c < end) {
        var acc = 0.0
        val voff = c * dsub
        var j = 0
        while (j < dsub) { acc += x(base + j) * codeVecs(voff + j); j += 1 }
        val score = 2.0 * acc - wn2(c)
        if (score > best) { best = score; bestCode = codeIds(c) }
        c += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
