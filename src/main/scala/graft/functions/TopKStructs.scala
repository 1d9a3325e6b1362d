package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded-heap top-k aggregate: the scalable replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY s) <= k`.
  *
  * The window formulation shuffles and SORTS every row of every group —
  * at 100 TB that is a full-data exchange plus an O(n log n) sort whose
  * output is then 99.99% discarded. As a TypedImperativeAggregate this
  * runs inside ordinary two-phase aggregation: each map task keeps at
  * most k rows per group in a min-heap (partial_topk), so the shuffle
  * carries ≤ k·partitions rows per group instead of all of them, and
  * nothing is ever globally sorted.
  *
  * Input is a STRUCT column whose field order IS the sort order (struct
  * ordering is lexicographic by field): the k LARGEST structs survive
  * and `eval` emits them largest-first. Callers put the ranking key(s)
  * first and a unique tiebreaker last for determinism — see
  * `ops.TopK.perGroup`. Null structs are ignored (standard aggregate
  * null semantics); heap rows round-trip partial→final as UnsafeRow
  * bytes.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStructs.Buffer] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ordering =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty && k > 0 => TypeCheckResult.TypeCheckSuccess
    case _: StructType => TypeCheckResult.TypeCheckFailure(
      s"topk needs a non-empty struct and k > 0, got k=$k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk requires a struct column, got ${other.catalogString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): TopKStructs.Buffer =
    new TopKStructs.Buffer(k, ordering)

  override def update(buf: TopKStructs.Buffer, input: InternalRow): TopKStructs.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(buf: TopKStructs.Buffer, other: TopKStructs.Buffer): TopKStructs.Buffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buf.insert(it.next())
    buf
  }

  override def eval(buf: TopKStructs.Buffer): Any = {
    val arr = buf.heap.toArray(new Array[InternalRow](buf.heap.size))
    java.util.Arrays.sort(arr, ordering.asInstanceOf[Ordering[InternalRow]].reverse)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKStructs.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val u = toUnsafe(it.next())
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStructs.Buffer = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      // rows arrive pre-bounded from a peer heap; insert re-applies the
      // bound so merge stays O(k log k) regardless of partial count
      buf.insertOwned(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
}

object TopKStructs {

  /** Min-heap of the k largest structs seen so far: the root is the
    * smallest survivor, so admission is one compare and replacement is
    * O(log k). Insert COPIES the row (Spark reuses eval buffers). */
  final class Buffer(k: Int, ord: Ordering[Any]) {
    val heap = new java.util.PriorityQueue[InternalRow](
      math.max(1, k),
      new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(a, b)
      })

    def insert(r: InternalRow): Unit = {
      if (heap.size < k) heap.add(r.copy())
      else if (ord.compare(r, heap.peek()) > 0) { heap.poll(); heap.add(r.copy()) }
    }

    /** Insert a row this buffer already owns (deserialized) — no copy. */
    def insertOwned(r: InternalRow): Unit = {
      if (heap.size < k) heap.add(r)
      else if (ord.compare(r, heap.peek()) > 0) { heap.poll(); heap.add(r) }
    }
  }
}
