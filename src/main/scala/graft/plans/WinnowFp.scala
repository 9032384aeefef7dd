package graft.plans

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set (k=8, w=4) of a document as ONE scalar
  * expression.
  *
  * Semantics are value-identical to the relational formulation in
  * `operators/TextOps.winnowFingerprintsRelational` (which the DuckDB
  * oracle still runs): per character position p ∈ [1, len−7],
  * h = first 10 md5 hex chars of the 8-char k-gram as a 40-bit integer;
  * key = h·2²⁰ + (2²⁰−1−p) so a window MIN selects (min hash, rightmost
  * position); one fingerprint per full window of 4 consecutive
  * positions; the result is the doc's DISTINCT selected hashes, sorted.
  * The relational form explodes one row per position through TWO window
  * functions (an Exchange + sort per doc batch) and a distinct — a
  * ~len(text) row blowup per document. This expression runs the same
  * arithmetic in a per-row loop inside whole-stage codegen: zero extra
  * rows, zero shuffles before the fingerprint groupBy.
  *
  * Null text → null. Docs shorter than k+w−1 = 11 chars have no full
  * window → empty array (the relational filter emits no rows for them).
  * Position is capped at 2²⁰ (1 MB docs — chunk longer docs upstream),
  * matching the relational encoding.
  */
case class WinnowFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WinnowFp needs string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowUtil.winnow($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFp {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column wrapper: winnowFp($"text") → array<bigint> fingerprints. */
  def winnowFp(text: Column): Column =
    ColumnShim.column(WinnowFp(ColumnShim.expression(text)))
}

/** Static helpers referenced from generated code. */
object WinnowUtil {

  private final val K = 8
  private final val W = 4

  /** First 10 md5 hex chars of the k-gram as a 40-bit non-negative long —
    * identical to conv(substring(md5(gram), 1, 10), 16, 10). */
  def gramHash(gram: UTF8String): Long = {
    val d = DigestUtils.md5(gram.getBytes)
    var v = 0L
    var j = 0
    while (j < 5) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v
  }

  def winnow(text: UTF8String): ArrayData = {
    val len = text.numChars()
    val nPos = len - (K - 1)
    val nWin = nPos - (W - 1)
    if (nWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    // keys for all positions (1-based p, matching the SQL form)
    val keys = new Array[Long](nPos)
    var p = 1
    while (p <= nPos) {
      val h = gramHash(text.substringSQL(p, K))
      keys(p - 1) = h * 1048576L + (1048575L - p)
      p += 1
    }
    // sliding MIN over W consecutive keys, one window per start position
    val out = new java.util.TreeSet[java.lang.Long]()
    var s = 0
    while (s < nWin) {
      var m = keys(s)
      var j = 1
      while (j < W) {
        if (keys(s + j) < m) m = keys(s + j)
        j += 1
      }
      out.add(m / 1048576L)
      s += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}
