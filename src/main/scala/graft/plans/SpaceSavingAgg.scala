package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom imperative aggregate: Misra–Gries heavy-hitters sketch over
  * 64-bit keys — the third sketch family next to MinHash (similarity)
  * and HLL (distinct): bounded-memory approximate TOP-K BY FREQUENCY.
  *
  * Buffer = at most k (key → counter) pairs. Update is classic MG:
  * increment a present key, insert while fewer than k keys are tracked,
  * otherwise decrement every counter (dropping zeros) — that "charges"
  * one occurrence of each tracked key against the unseen one. Merge sums
  * counters pairwise, then restores the k-bound by subtracting the
  * (k+1)-largest counter from all (the Agarwal et al. mergeability
  * result), so partial aggregation composes exactly like any algebraic
  * agg: map-side partials fold a partition into ≤ k pairs, and the
  * shuffle moves one tiny sketch per group — the property that makes
  * corpus-wide heavy-hitter mining affordable at 100 TB, where an exact
  * groupBy-count must shuffle every distinct key.
  *
  * Guarantee: any key with true frequency > n/(k+1) is present, and each
  * reported counter underestimates its true count by at most n/(k+1)
  * (MG counters never overestimate). Counter VALUES depend on encounter
  * order, so this is spec-gated (error-bound assertions in SketchSpec)
  * rather than oracle-hashed — same policy as HLL (D9).
  */
case class SpaceSavingAgg(child: Expression, k: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(new StructType().add("key", LongType).add("cnt", LongType),
      containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long],
                      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      buf.get(x) match {
        case Some(c) => buf.update(x, c + 1)
        case None if buf.size < k => buf.update(x, 1L)
        case None =>
          // decrement-all; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[Long]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[Long, Long],
                     b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-largest counter from all; drop non-positives
      val cut = a.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[Long]
      a.keysIterator.foreach { key =>
        val c = a(key) - cut
        if (c <= 0) dead += key else a.update(key, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    // deterministic presentation order: count desc, key asc
    val rows = buf.toArray.sortBy { case (key, c) => (-c, key) }
      .map { case (key, c) => InternalRow(key, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (key, c) => bb.putLong(key); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "heavy_hitters"
}

object SpaceSavingAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** `heavy_hitters(x, k)` as a Column aggregate over a BIGINT key col:
    * returns ARRAY<STRUCT<key, cnt>> sorted (cnt desc, key asc). */
  def heavyHitters(c: Column, k: Int): Column =
    ColumnShim.column(SpaceSavingAgg(ColumnShim.expression(c), k).toAggregateExpression())
}
