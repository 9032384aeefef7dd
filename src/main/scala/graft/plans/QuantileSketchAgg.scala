package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable approximate-quantile sketch state (KLL/MRL-style compactor
  * stack) over BIGINT values.
  *
  * `levels(h)` holds items that each stand for `2^h` input rows. Items
  * enter at level 0; when a level reaches `k` items it is sorted and
  * every other item (starting at a deterministically chosen offset) is
  * promoted to level `h+1` with doubled weight — halving the level and
  * charging at most `2^h` rank error per compaction in the worst case
  * (the straddling pair's kept end can go the wrong way by the full
  * level weight; the alternating offset halves this in EXPECTATION but
  * not provably). Summing over the ~`n/(k·2^h)` compactions a level sees
  * gives the provable worst-case rank-error bound
  *
  *   |rank_est − rank_true| ≤ H·n/k,  H = number of levels ≈ log2(n/k),
  *
  * independent of input order. The offset bit comes from a fixed-seed
  * hash of a compaction counter (no RNG state, no `Math.random`), so a
  * given merge tree reproduces bit-identical results; across different
  * partition layouts only the ε-bounded estimate moves, never past the
  * bound — the same policy as the HLL (D9) and Misra–Gries sketches:
  * spec-gated error bounds, plus a driver-graded self-check query
  * (`agg_quantile_sketch_rank`) whose PASS flag embeds the bound.
  *
  * Why it exists: the registry's exact quantile paths (histogram method,
  * two-phase weighted-median refine) either need a bounded domain or a
  * second pass. This is the one-pass mergeable form a 100 TB cluster
  * needs — the map side folds each partition into a ~`k·log(n/k)`-item
  * buffer and the shuffle moves one small sketch per group, exactly like
  * any algebraic aggregate.
  */
final class KllState(val k: Int) extends Serializable {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
  var count: Long = 0L
  private var compactions: Long = 0L

  /** Fixed-seed splitmix64 bit — deterministic offset choice per
    * compaction, alternating enough for the ±w/2 errors to cancel. */
  private def offsetBit(): Int = {
    var z = compactions * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    compactions += 1
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 1L).toInt
  }

  def insert(x: Long): Unit = {
    levels(0) += x
    count += 1
    if (levels(0).length >= k) compress()
  }

  /** Compact every level at/over capacity, cascading upward. A level is
    * sorted, an odd leftover item (if any) stays behind at the end the
    * offset bit picks, and every other remaining item is promoted with
    * doubled weight. */
  def compress(): Unit = {
    var h = 0
    while (h < levels.length) {
      if (levels(h).length >= k) {
        val sorted = levels(h).toArray
        java.util.Arrays.sort(sorted)
        if (h + 1 == levels.length) levels += mutable.ArrayBuffer.empty[Long]
        val bit = offsetBit()
        val keep = levels(h)
        keep.clear()
        var lo = 0
        var hi = sorted.length
        if ((hi - lo) % 2 != 0) { // weight bookkeeping needs an even count
          if (bit == 0) { hi -= 1; keep += sorted(hi) }
          else { keep += sorted(lo); lo += 1 }
        }
        var i = lo + bit
        while (i < hi) { levels(h + 1) += sorted(i); i += 2 }
      }
      h += 1
    }
  }

  def mergeIn(o: KllState): Unit = {
    count += o.count
    while (levels.length < o.levels.length)
      levels += mutable.ArrayBuffer.empty[Long]
    var h = 0
    while (h < o.levels.length) { levels(h) ++= o.levels(h); h += 1 }
    compress()
  }

  /** Smallest retained value whose estimated rank reaches ceil(q·n) —
    * quantile_disc semantics over the weighted item multiset. */
  def quantiles(qs: Array[Double]): Array[Long] = {
    var m = 0
    levels.foreach(m += _.length)
    val vals = new Array[Long](m)
    val wts = new Array[Long](m)
    var idx = 0
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach { v => vals(idx) = v; wts(idx) = w; idx += 1 }
      h += 1
    }
    val order = (0 until m).sortBy(vals(_)).toArray
    var total = 0L
    wts.foreach(total += _)
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var i = 0
      var res = vals(order(m - 1))
      var done = false
      while (i < m && !done) {
        cum += wts(order(i))
        if (cum >= target) { res = vals(order(i)); done = true }
        i += 1
      }
      res
    }
  }

  /** Worst-case rank-error bound in rows: H·n/k plus one top-level item
    * weight 2^H for discretization. A single level-h compaction can shift
    * a rank by the FULL level weight 2^h (when the straddling pair's kept
    * end goes the wrong way), not 2^(h-1) — the alternating-offset scheme
    * halves this in expectation but not in the worst case, so the provable
    * per-level term is n/k, giving H·n/k over H levels. This matches the
    * slack `rankOkSql` grades with. */
  def rankErrorBound: Long =
    (levels.length.toLong * count) / k + (1L << levels.length)
}

/** `quantile_sketch(x, k, array(q1, q2, ...))` — one-pass mergeable
  * approximate quantiles; returns ARRAY<BIGINT> of the retained values at
  * the requested ranks (NULL for an all-NULL/empty group). */
case class QuantileSketchAgg(child: Expression, k: Int, qs: Seq[Double],
                             override val mutableAggBufferOffset: Int = 0,
                             override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  require(k >= 8, s"quantile_sketch: k must be >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
    s"quantile_sketch: quantiles must be in (0, 1], got $qs")

  // Analysis-time child-type gate: update() casts to Long, so a non-BIGINT
  // child must fail analysis, not ClassCastException mid-execution.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch requires a BIGINT child (cast explicitly), " +
        s"got ${child.dataType.simpleString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KllState, b: KllState): KllState = { a.mergeIn(b); a }

  override def eval(buf: KllState): Any =
    if (buf.count == 0L) null
    else new GenericArrayData(buf.quantiles(qs.toArray))

  override def serialize(buf: KllState): Array[Byte] = {
    var n = 0
    buf.levels.foreach(n += _.length)
    val bb = ByteBuffer.allocate(4 + 8 + 4 + buf.levels.length * 4 + n * 8)
    bb.putInt(buf.k)
    bb.putLong(buf.count)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.count = bb.getLong
    val nLevels = bb.getInt
    var h = 0
    while (h < nLevels) {
      if (st.levels.length <= h) st.levels += mutable.ArrayBuffer.empty[Long]
      var m = bb.getInt
      while (m > 0) { st.levels(h) += bb.getLong; m -= 1 }
      h += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column form: `quantileSketch($"x", 512, Seq(0.5, 0.99))`. */
  def quantileSketch(c: Column, k: Int, qs: Seq[Double]): Column =
    ColumnShim.column(
      QuantileSketchAgg(ColumnShim.expression(c), k, qs).toAggregateExpression())

  /** SQL text for "did the rank-error theorem hold": given exact interval
    * ranks `rLt` = count(< v̂), `rLe` = count(≤ v̂) and a target rank
    * expression over a group-size column `n`, emits 1 iff the target lies
    * inside [rLt − slack, rLe + slack] where slack is the provable
    * worst-case KLL bound H·n/k + 2^H (each compaction can shift a rank by
    * the full level weight; see KllState.rankErrorBound — same figure, H
    * recomputed from n; same formula agg_quantile_sketch_rank grades with).
    */
  def rankOkSql(k: Int, rLt: String, rLe: String, target: String): String = {
    val h = s"greatest(floor(log2(greatest(n div $k, 1))) + 2, 1)"
    val slack = s"(2 * ($h * n div ${2 * k}) + cast(pow(2, $h) as bigint))"
    s"CASE WHEN $rLt - $slack <= $target AND $target <= $rLe + $slack THEN 1 ELSE 0 END"
  }
}
