package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate with PER-FIELD sort directions.
  *
  * Spark's CollectTopK orders items by the struct's natural (uniform)
  * ordering, which cannot express the most common ranking shape —
  * `value DESC, id ASC` — so graft.plans.RewriteWindowTopK would have to
  * leave those windows alone. This aggregate owns its comparator: the
  * first `directions.length` fields of the item struct are compared
  * lexicographically, each ascending or descending per `directions(i)`
  * (nulls take the direction's Spark default: first when ascending, last
  * when descending).
  *
  * Buffer = a bounded binary heap ordered worst-at-root (evict cheaply);
  * update/merge are O(log k) per item; eval sorts the k survivors into
  * rank order, so callers posexplode WITHOUT re-sorting. Partial
  * aggregation applies — each map task ships at most k items per group.
  */
case class TopKOrdered(child: Expression, k: Int, directions: Seq[Boolean],
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(k >= 1, s"k must be >= 1, got $k")

  private lazy val itemType = child.dataType.asInstanceOf[StructType]
  require(directions.nonEmpty, "at least one sort field")

  override def dataType: DataType = ArrayType(itemType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_ordered"

  /** rank order: negative when a ranks before b. */
  private lazy val rankCompare: (InternalRow, InternalRow) => Int = {
    val fieldOrderings = directions.indices.map { i =>
      TypeUtils.getInterpretedOrdering(itemType(i).dataType)
    }
    val types = directions.indices.map(i => itemType(i).dataType)
    (a: InternalRow, b: InternalRow) => {
      var i = 0
      var cmp = 0
      while (cmp == 0 && i < directions.length) {
        val av = if (a.isNullAt(i)) null else a.get(i, types(i))
        val bv = if (b.isNullAt(i)) null else b.get(i, types(i))
        cmp = (av, bv) match {
          case (null, null) => 0
          // Spark defaults: asc => NULLS FIRST ranks null best;
          // desc => NULLS LAST ranks null worst — both mean null FIRST in
          // ascending comparisons, flipped below for desc like any value
          case (null, _) => -1
          case (_, null) => 1
          case (x, y) => fieldOrderings(i).compare(x, y)
        }
        if (!directions(i)) cmp = -cmp
        i += 1
      }
      cmp
    }
  }

  /** Heap comparator: WORST item at the root. */
  private lazy val heapCmp = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = rankCompare(b, a)
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.min(k, 16), heapCmp)

  @transient private lazy val copyProjection = UnsafeProjection.create(itemType)

  override def update(buffer: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buffer.size < k) {
        buffer.offer(copyProjection(row).copy())
      } else if (rankCompare(row, buffer.peek()) < 0) {
        buffer.poll()
        buffer.offer(copyProjection(row).copy())
      }
    }
    buffer
  }

  override def merge(buffer: java.util.PriorityQueue[InternalRow],
                     other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (buffer.size < k) buffer.offer(row)
      else if (rankCompare(row, buffer.peek()) < 0) {
        buffer.poll(); buffer.offer(row)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buffer.toArray(new Array[InternalRow](buffer.size))
    java.util.Arrays.sort(arr, new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = rankCompare(a, b)
    })
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buffer.toArray(new Array[InternalRow](buffer.size))
    val parts = rows.map { r =>
      // the heap holds each row's OWN UnsafeRow (update copies on insert),
      // so getBytes is safe even when it returns the backing array
      // directly. NEVER serialize through the shared copyProjection buffer:
      // for fixed-width items getBytes aliases it and every serialized
      // item silently becomes the last one.
      val u = r match {
        case ur: UnsafeRow => ur
        case other => copyProjection(other).copy()
      }
      u.getBytes
    }
    val total = 4 + parts.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(parts.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val part = new Array[Byte](len)
      bb.get(part)
      val row = new UnsafeRow(itemType.length)
      row.pointTo(part, len)
      q.offer(row)
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKOrdered =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKOrdered =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKOrdered =
    copy(child = newChild)
}
