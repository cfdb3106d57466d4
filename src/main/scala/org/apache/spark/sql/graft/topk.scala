package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate: keeps the k SMALLEST struct values under the
  * struct's natural (lexicographic) ordering — encode "top by x descending"
  * as a leading `-x` field. The buffer never exceeds k rows, so partial
  * (map-side) aggregation ships k rows per key per partition instead of the
  * whole group; a window `row_number() <= k` would shuffle and sort EVERY
  * row. At 100 TB this is the difference between a bounded-state combiner
  * and a full-data window materialization.
  *
  * Returns the k rows as an ascending-sorted ARRAY<STRUCT> (posexplode for
  * ranks 1..k).
  *
  * `distinct = true` makes the buffer a k-smallest SET (duplicate rows are
  * skipped on insert and merge) — the state a KMV sketch needs: the k
  * smallest DISTINCT hash values are a pure function of the value SET, so
  * the aggregate is order-, partitioning-, AND multiplicity-independent
  * (q78 gets the set property by pre-`distinct()`ing; streaming cannot,
  * because exact dedup state is unbounded — this flag is the O(k) answer).
  * The duplicate check is a linear scan over ≤ k byte-equal rows: at k=32
  * that is cheaper than maintaining a side hash set per group.
  */
case class TopKStruct(
    child: Expression,
    k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k > 0, "k must be positive")
  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val ordering: Ordering[InternalRow] =
    org.apache.spark.sql.catalyst.expressions.RowOrdering
      .createNaturalAscendingOrdering(structType.fields.map(_.dataType).toSeq)
  @transient private lazy val proj: UnsafeProjection = UnsafeProjection.create(structType)

  /** Max-heap of the current k smallest: head = largest kept, evicted first. */
  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k + 1, ordering.reverse.asInstanceOf[Ordering[UnsafeRow]])

  /** Distinct-mode duplicate test uses the SAME ordering that ranks rows,
    * not UnsafeRow byte equality: on float/double fields 0.0 and -0.0 (and
    * differing NaN bit patterns) are ordering-equal but byte-distinct, and
    * a distinct set keyed on bytes would keep both — the sketch would stop
    * being a pure function of the value set. */
  private def contains(buf: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow): Boolean = {
    val it = buf.iterator()
    while (it.hasNext) if (ordering.compare(it.next(), row) == 0) return true
    false
  }

  /** `row` may be a REUSED buffer (UnsafeProjection's output): the heap
    * test and duplicate scan run against it in place, and a private copy
    * is materialized ONLY on actual insertion (`copyOnInsert`). Copying
    * before the test — the original formulation — allocated one UnsafeRow
    * + byte array per INPUT row, and on the kNN-graph tier (2.9e8
    * candidate rows, almost all discarded against the k-th best) that
    * allocation churn was ~70% of the dominant stage's CPU as GC
    * (r13 stage probe: gc 43-51 s of cpu 60-74 s). Post-insert the heap
    * only ever holds private copies, so the reused buffer never aliases
    * stored state. */
  private def insert(buf: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow,
      copyOnInsert: Boolean): Unit = {
    if (buf.size < k) {
      if (!(distinct && contains(buf, row))) buf.add(if (copyOnInsert) row.copy() else row)
    } else if (ordering.compare(row, buf.peek()) < 0) {
      if (!(distinct && contains(buf, row))) {
        buf.poll()
        buf.add(if (copyOnInsert) row.copy() else row)
      }
    }
  }

  override def update(
      buf: java.util.PriorityQueue[UnsafeRow], input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, proj(v.asInstanceOf[InternalRow]), copyOnInsert = true)
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[UnsafeRow],
      other: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    // rows in `other` are private (deserialize allocates them; the merge
    // contract retires the source buffer) — moved, never copied
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next(), copyOnInsert = false)
    buf
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    val arr = buf.toArray(new Array[UnsafeRow](buf.size))
    java.util.Arrays.sort(arr, ordering.asInstanceOf[java.util.Comparator[UnsafeRow]])
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val r = it.next()
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  /** INVARIANT (merge depends on it): every row this returns must OWN its
    * backing byte array — merge() moves these rows into the live buffer
    * WITHOUT copying, so pointing them into a shared/reused buffer (e.g.
    * to cut allocations) would silently alias retired state into live
    * heaps. The per-row `new Array[Byte]` below is that ownership. */
  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_struct"
}
