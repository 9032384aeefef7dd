package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All sign-LSH bucket ids of one embedding in a single expression:
  * `value[t] = Σ_b (dot(vec, plane(t,b)) >= 0 ? 1<<b : 0)` for
  * t in [0, nTables).
  *
  * Exists because composing the same math from per-bit column expressions
  * (nTables × nBits `DotFold`-vs-literal-array nodes in one Project — 168
  * nodes at the sf10 auto-sized width) generates a method past the JIT's
  * huge-method bytecode limit, so the whole projection runs in the bytecode
  * interpreter: measured 169 s for 200k×64-dim at sf10. Here the generated
  * code is one call into [[compute]] — a compiled triple loop over a flat
  * weight matrix — so the projection stays inside whole-stage codegen and
  * the signature pass is FLOP-bound again (same plan shape at any corpus
  * size; the weight matrix is nTables×nBits×dim doubles of driver-side
  * md5-parity constants, shipped once per task, never per row).
  *
  * The bucket math is bit-identical to the composed form (same
  * [[graft.functions.AnnSearch.planeWeight]] planes, same ascending-index
  * fold into DOUBLE, same bit packing), so the DuckDB oracle SQL and every
  * recall/determinism spec are unchanged.
  */
case class SignBuckets(child: Expression, seed: Long, nTables: Int,
                       nBits: Int, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SignBuckets needs array<float|double>, got $t")
    }

  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Flat [t][b][d] plane matrix; rebuilt lazily per deserialized instance
  // (nTables×nBits×dim md5 calls, milliseconds) instead of being shipped.
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](nTables * nBits * dim)
    var off = 0
    var t = 0
    while (t < nTables) {
      var b = 0
      while (b < nBits) {
        var d = 0
        while (d < dim) {
          w(off) = graft.functions.AnnSearch.planeWeight(seed, t, b, d)
          off += 1; d += 1
        }
        b += 1
      }
      t += 1
    }
    w
  }

  def compute(v: ArrayData): ArrayData = {
    val isF = elemIsFloat
    val n = math.min(dim, v.numElements())
    val x = new Array[Double](dim) // beyond-n stays 0.0 = the fold's no-op
    var i = 0
    while (i < n) {
      x(i) = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val w = weights
    val out = new Array[Long](nTables)
    var off = 0
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += x(j) * w(off + j); j += 1 }
        if (acc >= 0) bucket |= (1L << b)
        off += dim; b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBuckets", this, classOf[SignBuckets].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
