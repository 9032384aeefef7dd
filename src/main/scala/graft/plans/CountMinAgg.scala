package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch state: a `d × w` matrix of counters. Row `j` is
  * indexed by an independent hash of the key; a point-frequency estimate
  * is the MIN over the `d` cells the key maps to — never an undercount
  * (every cell the key touches received all of its increments), and over
  * by at most the collision mass in its least-loaded cell, the classic
  * `ε·n` bound with `ε = e/w` at confidence `1 − e^−d`.
  *
  * The hash family is NOT computed here: the aggregate takes the
  * pre-computed md5 hex digest of the key (codegen'd `md5()` upstream)
  * and slices four disjoint 8-hex-char (32-bit) windows out of it — the
  * same cross-engine trick as the MinHash/SimHash/ANN pieces, so a DuckDB
  * oracle rebuilds the identical sketch cell-for-cell
  * (`CAST('0x' || substring(md5(k), 1+8j, 8) AS BIGINT) % w`). Given the
  * hash inputs, the whole sketch is DETERMINISTIC, and merge is plain
  * elementwise addition — commutative and associative — so ANY partition
  * layout or merge tree yields the bit-identical matrix (stronger than
  * KLL, whose estimates move within the bound under re-layout).
  *
  * Why it exists: the registry's frequency paths are exact
  * (`groupBy(key).count` — a full shuffle of the key domain) or top-k
  * (`SpaceSavingAgg` — heavy hitters only). CMS is the missing point:
  * O(d·w) state per GROUP regardless of key cardinality, answering "how
  * often did THIS key occur" for any key after one pass — the form a
  * 100 TB cluster wants for per-shard frequency serving, join-skew
  * detection, and streaming state (a counter matrix per window).
  */
final class CmsState(val d: Int, val w: Int) extends Serializable {
  val cells: Array[Long] = new Array[Long](d * w)
  var count: Long = 0L

  /** Cell index of hash row `j` for a 32-hex-char md5 digest string:
    * unsigned 32-bit value of hex chars [8j, 8j+8) mod w. */
  def cellOf(hex: String, j: Int): Int =
    (java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16) % w).toInt

  def insert(hex: String): Unit = {
    // The d row hashes slice disjoint 8-hex-char windows out of the digest;
    // a short input means the caller passed a raw key instead of its md5 hex.
    require(hex.length >= 8 * d,
      s"cms_sketch: key must be a hex digest of >= ${8 * d} chars " +
        s"(pass md5(key), not the raw key); got length ${hex.length}")
    var j = 0
    while (j < d) { cells(j * w + cellOf(hex, j)) += 1; j += 1 }
    count += 1
  }

  def mergeIn(o: CmsState): Unit = {
    var i = 0
    while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
    count += o.count
  }

  /** Point-frequency estimate: min over the d cells of the key. */
  def estimate(hex: String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = cells(j * w + cellOf(hex, j))
      if (c < best) best = c
      j += 1
    }
    if (best == Long.MaxValue) 0L else best
  }
}

/** `cms_sketch(md5_hex, d, w)` — one-pass mergeable Count-Min frequency
  * sketch; returns the `d·w` counter matrix flattened row-major as
  * ARRAY<BIGINT> (internal representation — graded queries extract
  * scalar estimates via `element_at`, never emit the array itself, rule
  * R9a). `d` ≤ 4 because one md5 digest yields four independent 32-bit
  * slices. */
case class CountMinAgg(child: Expression, d: Int, w: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  require(d >= 1 && d <= 4, s"cms_sketch: d must be in 1..4, got $d")
  require(w >= 2 && w <= (1 << 20), s"cms_sketch: w must be in 2..2^20, got $w")

  // Analysis-time child-type gate: the child is the md5 HEX STRING of the
  // key — a non-string child must fail analysis, not mid-query.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires a STRING md5-hex child (pass md5(key)), " +
        s"got ${child.dataType.simpleString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CmsState = new CmsState(d, w)

  override def update(buf: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: CmsState, b: CmsState): CmsState = { a.mergeIn(b); a }

  override def eval(buf: CmsState): Any = new GenericArrayData(buf.cells)

  override def serialize(buf: CmsState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + 8 + buf.cells.length * 8)
    bb.putInt(buf.d)
    bb.putInt(buf.w)
    bb.putLong(buf.count)
    buf.cells.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new CmsState(bb.getInt, bb.getInt)
    st.count = bb.getLong
    var i = 0
    while (i < st.cells.length) { st.cells(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "cms_sketch"
}

object CountMinAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column form: `cmsSketch(md5($"k".cast("binary")), 4, 256)`. */
  def cmsSketch(hexCol: Column, d: Int, w: Int): Column =
    ColumnShim.column(
      CountMinAgg(ColumnShim.expression(hexCol), d, w).toAggregateExpression())
}
