package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom imperative aggregate: a MinHash sketch over 64-bit element
  * hashes (SURVEY §4 optional piece #2).
  *
  * Buffer = `nHashes` running minima of the permutation family
  * `h_j(x) = ((2j+1)·x + 7j+3) mod p` — the same family the SQL/DataFrame
  * formulation uses, so signatures are identical. The win at scale: the
  * map side folds every shingle into one fixed 16-long buffer per group
  * (partial aggregation), so the shuffle moves one 128-byte sketch per
  * document instead of nHashes× exploded rows; sketches are union-able
  * (elementwise min), which is exactly the property a 100 TB near-dup
  * pass needs.
  */
case class MinHashAgg(child: Expression, nHashes: Int,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val prime = 2147483647L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(nHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < nHashes) {
        val h = ((2L * j + 1L) * x + 7L * j + 3L) % prime
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "minhash_sketch"
}

object MinHashAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** `minhash_sketch(x, n)` as a Column aggregate over a BIGINT hash col. */
  def minhash(c: Column, nHashes: Int): Column =
    ColumnShim.column(MinHashAgg(ColumnShim.expression(c), nHashes).toAggregateExpression())
}
