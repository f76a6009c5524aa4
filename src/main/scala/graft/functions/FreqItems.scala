package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable typed aggregate —
  * the heavy-hitter answer when the value domain does NOT fit a shuffle
  * (exact mode/argmax covers the bounded-domain case).
  *
  * State is at most `k` (item, count) counters plus one decrement total.
  * Guarantees, independent of partitioning and merge order:
  *  - any item with true frequency > n/(k+1) is present in the output;
  *  - every reported estimate undercounts: est ≤ true ≤ est + err, where
  *    err is the sketch's accumulated decrement total.
  *
  * Partial aggregation applies — each map task ships ≤ k counters per
  * group, so a 100 TB scan reduces to (groups × k) rows of shuffle. The
  * merge is the Agarwal et al. mergeable-summaries rule: add counters,
  * then subtract the (k+1)-th largest count and drop non-positives.
  *
  * Items are CLONED on update: the incoming UTF8String points into a
  * reused row buffer, and storing it without a copy would alias every
  * key to the last row read.
  */
case class FreqItems(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqItems.State]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(k >= 1, s"k must be >= 1, got $k")
  require(child.dataType == StringType, "graft_freq_items takes a string column")

  import FreqItems.State

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("err", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): State = new State()

  override def update(s: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val cur = s.m.get(item)
      // put() on an existing key keeps the stored key object, so the
      // increment path needs no copy; only a NEW entry stores the key
      if (cur != null) s.m.put(item, cur + 1L)
      else if (s.m.size < k) s.m.put(item.clone(), 1L)
      else s.decrementAll(1L)
    }
    s
  }

  override def merge(a: State, b: State): State = {
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.m.get(e.getKey)
      a.m.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    a.decr += b.decr
    if (a.m.size > k) {
      // subtract the (k+1)-th largest count: keeps ≤ k counters and
      // preserves the undercount invariant (Agarwal et al. merge)
      val counts = new Array[Long](a.m.size)
      var i = 0
      val vs = a.m.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      a.subtractAndPrune(cut)
    }
    a
  }

  override def eval(s: State): Any = {
    val entries = new Array[(UTF8String, Long)](s.m.size)
    var i = 0
    val it = s.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c, s.decr))
    })
  }

  override def serialize(s: State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(s.decr)
    out.writeInt(s.m.size)
    val it = s.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new State()
    s.decr = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      s.m.put(UTF8String.fromBytes(buf), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

object FreqItems {

  /** k counters + the total decrement applied (the per-item error bound). */
  final class State {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    var decr: Long = 0L

    def decrementAll(by: Long): Unit = { subtractAndPrune(by) }

    def subtractAndPrune(by: Long): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - by
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      decr += by
    }
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registration.registerOnce(spark, "graft_freq_items", {
      case Seq(c, Literal(kk: Int, IntegerType)) => FreqItems(c, kk)
      case other => throw new IllegalArgumentException(
        s"graft_freq_items(col, k: int literal), got $other")
    })
}
