package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving summary: at most `capacity` (key → count, error) slots.
  * Insert of a known key adds to its count; of a new key with free slots
  * starts at (w, 0); otherwise the minimum-count slot m is evicted and the
  * new key gets (m.count + w, m.count) — the classic Metwally et al.
  * guarantee: true_count ≤ count ≤ true_count + error, and every key with
  * true count > N/capacity is present.
  *
  * When the number of distinct keys never exceeds `capacity` (the
  * reference sizes capacity = limit × 20), no eviction happens anywhere
  * and the sketch is EXACT — including across partial-aggregate merges.
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  // key → (count, error). Min-slot eviction does a linear scan — the
  // sketch is small (≤ limit×20 entries) and per-row work stays O(1)
  // amortized because evictions only happen once the map is full.
  val slots = new java.util.HashMap[UTF8String, Array[Long]]()

  def add(key: UTF8String, w: Long): Unit = {
    val cur = slots.get(key)
    if (cur != null) cur(0) += w
    else if (slots.size < capacity) slots.put(key.clone(), Array(w, 0L))
    else {
      var minKey: UTF8String = null
      var minCount = Long.MaxValue
      val it = slots.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue()(0) < minCount) { minCount = e.getValue()(0); minKey = e.getKey }
      }
      slots.remove(minKey)
      slots.put(key.clone(), Array(minCount + w, minCount))
    }
  }

  /** Parallel SpaceSaving merge: sum common slots (counts and error
    * bounds add), import the rest, then trim back to capacity keeping the
    * largest counts. Exact when neither side ever evicted and the union
    * fits.
    */
  def mergeIn(other: SpaceSaving): Unit = {
    val it = other.slots.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = slots.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else slots.put(e.getKey, e.getValue.clone())
    }
    if (slots.size > capacity) {
      val entries = new java.util.ArrayList(slots.entrySet())
      entries.sort((a, b) => java.lang.Long.compare(b.getValue()(0), a.getValue()(0)))
      var i = capacity
      while (i < entries.size) { slots.remove(entries.get(i).getKey); i += 1 }
    }
  }
}

/** `topKWeighted(k, loadFactor)(key, weight)` — approximate top-k keys by
  * summed weight (reference `console/query.go:95-120`: ClickHouse
  * `topKWeighted(limit, 20)(tuple(dims), weight)`, used only on raw-table
  * scans where exact ranking would shuffle the full dimensionality).
  *
  * Capacity = k × loadFactor. Output: `array<struct<key:string,
  * weight:bigint>>` sorted by (weight desc, key asc) and truncated to k.
  * Partial aggregation works (map-side sketches merge), so the full rows
  * never shuffle — only fixed-size sketches do.
  */
case class TopKWeighted(
    key: Expression,
    weight: Expression,
    k: Int,
    loadFactor: Int = 20,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] {
  require(k >= 1 && loadFactor >= 1)

  private val capacity = k * loadFactor

  override def children: Seq[Expression] = Seq(key, weight)

  // Accept any integral weight and widen in update() — blanket implicit
  // casting would also truncate fractional weights and even stringify a
  // swapped key argument silently; reject those at analysis time instead.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (key.dataType, weight.dataType) match {
      case (StringType, ByteType | ShortType | IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (kt, wt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_weighted needs (string, integral), got (${kt.sql}, ${wt.sql})")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("weight", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_weighted"

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val kv = key.eval(input)
    if (kv != null) {
      val wv = weight.eval(input)
      if (wv != null)
        buf.add(kv.asInstanceOf[UTF8String], wv.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: SpaceSaving, other: SpaceSaving): SpaceSaving = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: SpaceSaving): Any = {
    val entries = new java.util.ArrayList(buf.slots.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val n = math.min(k, entries.size)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = entries.get(i)
      out(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: SpaceSaving): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.slots.size)
    val it = buf.slots.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue()(0))
      out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSaving(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.slots.put(UTF8String.fromBytes(kb), Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKWeighted =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKWeighted =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKWeighted =
    copy(key = newChildren(0), weight = newChildren(1))
}

object TopKWeighted {
  /** Column API: `topKWeighted(key, weight, k)` aggregate. */
  def apply(key: Column, weight: Column, k: Int, loadFactor: Int): Column =
    GraftBridge.column(
      new TopKWeighted(GraftBridge.expression(key),
        GraftBridge.expression(weight), k, loadFactor).toAggregateExpression())
}
