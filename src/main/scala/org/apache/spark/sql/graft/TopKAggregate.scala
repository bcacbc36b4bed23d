package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native typed aggregate —
  * `graft_topk(value, capacity, k)` → `array<struct<value,count>>`.
  *
  * The scale path for frequency profiling (the reference's rare/frequent
  * value rules, `/root/reference/Data_Quality_File.sql` mode checks): an
  * exact per-value groupBy over a 100 TB column shuffles every distinct
  * value; a Misra–Gries summary keeps a FIXED `capacity` counters per
  * partition, merges associatively on the driver-bound final state, and
  * guarantees every value with true frequency > n/capacity survives with
  * count undercounted by at most n/capacity (Misra & Gries 1982; merge
  * bound per Agarwal et al., PODS'12). capacity ≥ #distinct degenerates
  * to EXACT counts — the registered gate query runs in that regime so
  * DuckDB can oracle the whole update/merge/serialize/eval path
  * hash-exactly; the sub-capacity sketch regime is spec-pinned against
  * exact counts on the same corpus.
  *
  * Determinism: counts in the sub-capacity regime depend on partition
  * layout (like every mergeable sketch); the VALUE SET guarantee above
  * holds under any layout. Output is sorted (count desc, value asc) and
  * truncated to `k`, so equal inputs + equal layout ⇒ equal output.
  */
case class TopKSketch(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[UTF8String, Long]]
  with ExpectsInputTypes {

  require(capacity > 0, "capacity must be positive")
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("count", LongType))))

  override def createAggregationBuffer()
      : mutable.LinkedHashMap[UTF8String, Long] =
    mutable.LinkedHashMap.empty

  override def update(
      buffer: mutable.LinkedHashMap[UTF8String, Long],
      input: InternalRow): mutable.LinkedHashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1)
        case None if buffer.size < capacity =>
          // defensive copy: UTF8String from an unsafe row points into a
          // reused page; the buffer outlives the row
          buffer.update(key.clone(), 1L)
        case None =>
          // classic MG step: decrement every counter, evict zeros.
          // Amortized O(1): each decrement cancels one prior increment.
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buffer.mapValuesInPlace((_, c) => c - 1)
          buffer.foreach { case (key2, c) => if (c == 0L) dead += key2 }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.LinkedHashMap[UTF8String, Long],
      other: mutable.LinkedHashMap[UTF8String, Long])
      : mutable.LinkedHashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buffer.update(key, buffer.getOrElse(key, 0L) + c)
    }
    if (buffer.size > capacity) {
      // mergeable-summaries reduction: subtract the (capacity+1)-th
      // largest count from everything; ≤ capacity survivors remain and
      // the undercount bounds of the two inputs add.
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buffer.mapValuesInPlace((_, c) => c - cut)
      buffer.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(
      buffer: mutable.LinkedHashMap[UTF8String, Long]): Any = {
    val top = buffer.toArray
      .sortBy { case (v, c) => (-c, v) }
      .take(k)
      .map { case (v, c) => InternalRow(v, c) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(
      buffer: mutable.LinkedHashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (v, c) =>
      val b = v.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.LinkedHashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.LinkedHashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head)
}
