package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateNamedStruct, Expression, Literal, Multiply, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

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

  /** Allocation-free update fast path. Every inventory call site passes
    * `struct(...)`, so after binding `child` is a `CreateNamedStruct` —
    * whose eval allocates a GenericInternalRow PLUS a boxed value per
    * primitive field for EVERY input row, only for `proj` to immediately
    * re-serialize that row into its reused UnsafeRow buffer. Projecting
    * the struct's VALUE EXPRESSIONS directly against the input row
    * produces the bit-identical UnsafeRow (same field order and types;
    * the projection is codegen'd, so primitives never box) with ZERO
    * per-row allocation — the same transient-churn class the r16 TopKPair
    * fast path and the r17 sorted-merge kernel removed, and exactly what
    * big-heap JVM geometry punishes (BUILD_NOTES r17/r18: t08's driver
    * cpu ran 1.84× on bit-identical counters under the 64 GB heap; its
    * hot aggregate is this kernel over a 2.8M-row shuffle). The null-skip
    * is not lost: `CreateNamedStruct.eval` never returns null (a struct
    * of null FIELDS is still a non-null struct — those rows insert in
    * both paths, ranked nulls-first by the natural ordering). Any other
    * child shape (SQL registration with an arbitrary struct-typed arg)
    * falls back to eval with identical semantics; ExpressionsSpec pins
    * the two paths hash-equal. */
  @transient private lazy val directProj: UnsafeProjection = child match {
    case ns: CreateNamedStruct => UnsafeProjection.create(ns.valExprs)
    case _ => null
  }

  override def update(
      buf: java.util.PriorityQueue[UnsafeRow], input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    if (directProj != null) {
      insert(buf, directProj(input), copyOnInsert = true)
    } else {
      val v = child.eval(input)
      if (v != null) insert(buf, proj(v.asInstanceOf[InternalRow]), copyOnInsert = true)
    }
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

/** Flat-primitive buffer for [[TopKPair]]: the k smallest (neg_score, id)
  * pairs held SORTED ascending in two parallel primitive arrays. The whole
  * per-group state is one object + two k-element arrays (~3 heap objects,
  * contiguous), versus [[TopKStruct]]'s PriorityQueue of per-row UnsafeRows
  * (~2-3 objects + a byte[] PER KEPT ROW, all pointer-chased on every
  * probe). On the kNN-graph tier the aggregation hash map holds tens of
  * thousands of group buffers probed in hash-random order, so buffer
  * footprint IS the cache working set — the r13-r15 measured CPI fragility
  * of s11 under cache contention (BUILD_NOTES r13/r14 dose-response) is a
  * direct function of how many lines each probe touches. */
private[graft] final class PairTopK(val k: Int) {
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)
  var n: Int = 0
}

/** Bounded top-k aggregate SPECIALIZED to the ubiquitous (score DESC, id
  * ASC) shape: semantically identical to
  * `TopKStruct(struct(neg_score, id), k)` — same ordering (ascending
  * lexicographic, doubles compared with the same ==-then-compare rule
  * Catalyst's interpreted AND codegen'd orderings use, 0.0 ordering-equal
  * -0.0, NaN greatest), same distinct-by-ordering-equality semantics, same
  * ascending ARRAY<STRUCT<neg_score,neighbor_id>> result — but with
  * [[PairTopK]] flat state:
  *
  *   - update is two primitive evals + a branch against the current k-th
  *     best (no UnsafeProjection, no struct allocation, no comparator
  *     interface dispatch);
  *   - the partial-aggregation state serialized across the exchange is
  *     4 + 16·n bytes (vs length-prefixed UnsafeRows);
  *   - insertion keeps the arrays sorted (k is small — single-digit — so
  *     a linear scan + arraycopy shift beats any heap), which makes both
  *     the reject-fast-path (compare against slot n-1 only) and eval
  *     (already sorted) trivial.
  *
  * NULL semantics — a DOCUMENTED DIVERGENCE from the struct kernel: a
  * null in either input SKIPS the row (the usual aggregate-ignores-null
  * rule). `TopKStruct(struct(neg, id), k)` instead KEEPS such rows —
  * `struct(...)` itself is never null even when its fields are, and the
  * struct's natural ordering ranks null fields first — so the two
  * kernels agree only on null-free inputs. Every inventory call site
  * computes both inputs with null-free arithmetic, where the kernels are
  * bit-equivalent (the ExpressionsSpec equivalence pin); a SQL user
  * calling the registered `top_k_pair` on nullable columns gets the
  * row-drop semantics stated here, not the struct kernel's nulls-first
  * ranking. (r16 advice: the earlier scaladoc claimed the skip "matched"
  * TopKStruct — inaccurate, since only a null STRUCT is skipped there.)
  *
  * Field names of the result structs are pinned to (neg_score,
  * neighbor_id) — the [[graft.queries.SimilarityQueries.topKPerQuery]]
  * contract. */
case class TopKPair(
    negScore: Expression,
    id: Expression,
    k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PairTopK] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(negScore, id)
  override def nullable: Boolean = false

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (negScore.dataType == DoubleType && id.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires (DOUBLE, BIGINT) " +
        s"inputs, got (${negScore.dataType.sql}, ${id.dataType.sql})")
    }
  }

  private val structType: StructType = StructType(Seq(
    StructField("neg_score", DoubleType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def createAggregationBuffer(): PairTopK = new PairTopK(k)

  /** The exact double ordering RowOrdering uses for DoubleType
    * (SQLOrderingUtil.compareDoubles: `==` first — so 0.0 equals -0.0 —
    * then Double.compare, NaN greatest); ties break on id ascending.
    * Matching TopKStruct's natural struct ordering bit-for-bit is what
    * lets topKPerQuery swap kernels with hash-identical results
    * (ExpressionsSpec pins the equivalence on adversarial floats). */
  @inline private def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val c = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(s1, s2)
    if (c != 0) c else java.lang.Long.compare(i1, i2)
  }

  private def insert(buf: PairTopK, s: Double, i: Long): Unit = {
    if (buf.n == k && cmp(s, i, buf.scores(k - 1), buf.ids(k - 1)) >= 0) return
    if (distinct) {
      var j = 0
      while (j < buf.n) {
        if (cmp(s, i, buf.scores(j), buf.ids(j)) == 0) return
        j += 1
      }
    }
    var j = buf.n - 1
    while (j >= 0 && cmp(buf.scores(j), buf.ids(j), s, i) > 0) j -= 1
    val pos = j + 1
    val last = if (buf.n == k) k - 1 else buf.n
    System.arraycopy(buf.scores, pos, buf.scores, pos + 1, last - pos)
    System.arraycopy(buf.ids, pos, buf.ids, pos + 1, last - pos)
    buf.scores(pos) = s
    buf.ids(pos) = i
    if (buf.n < k) buf.n += 1
  }

  /** Boxing-free update fast path. After the planner binds this function,
    * `negScore` is one of two shapes at every inventory call site: a bare
    * `BoundReference` (DoubleType) or the constant-folded
    * `Multiply(BoundReference, Literal(-1.0))` topKPerQuery emits — and
    * `id` is always a `BoundReference` (LongType). `Expression.eval`
    * would box a Double (and the Multiply result) per input row; on the
    * kNN tier that is ~3e8 updates × 2 transient allocations — pure
    * allocator/bandwidth churn in the exact stage whose cache-contention
    * CPI is s11's measured fragility. The fast path reads the primitives
    * straight off the input row (IEEE `-x` ≡ `x * -1.0` bit-for-bit on
    * every input class: sign flip on finite/inf/zero, NaN stays NaN and
    * the ordering treats all NaN bit patterns equal). Any other
    * expression shape (SQL registration with arbitrary args) falls back
    * to eval with identical semantics — the equivalence spec drives both
    * paths. Modes: 0 = eval fallback, 1 = direct read, 2 = read + negate. */
  @transient private lazy val (scoreMode, scoreOrdinal): (Int, Int) = negScore match {
    case b: BoundReference if b.dataType == DoubleType => (1, b.ordinal)
    case Multiply(b: BoundReference, Literal(v: Double, DoubleType), _)
        if b.dataType == DoubleType && v == -1.0 => (2, b.ordinal)
    case Multiply(Literal(v: Double, DoubleType), b: BoundReference, _)
        if b.dataType == DoubleType && v == -1.0 => (2, b.ordinal)
    // SQL `-score` parses to UnaryMinus (double negation never fails,
    // whatever the ANSI flag) — same IEEE sign flip as the Multiply form
    case org.apache.spark.sql.catalyst.expressions.UnaryMinus(b: BoundReference, _)
        if b.dataType == DoubleType => (2, b.ordinal)
    case _ => (0, -1)
  }
  @transient private lazy val idOrdinal: Int = id match {
    case b: BoundReference if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  override def update(buf: PairTopK, input: InternalRow): PairTopK = {
    if (scoreMode != 0 && idOrdinal >= 0) {
      if (!input.isNullAt(scoreOrdinal) && !input.isNullAt(idOrdinal)) {
        val s0 = input.getDouble(scoreOrdinal)
        insert(buf, if (scoreMode == 2) -s0 else s0, input.getLong(idOrdinal))
      }
    } else {
      val s = negScore.eval(input)
      if (s != null) {
        val i = id.eval(input)
        if (i != null) {
          insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
        }
      }
    }
    buf
  }

  override def merge(buf: PairTopK, other: PairTopK): PairTopK = {
    var j = 0
    while (j < other.n) {
      insert(buf, other.scores(j), other.ids(j))
      j += 1
    }
    buf
  }

  override def eval(buf: PairTopK): Any = {
    val out = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      out(j) = InternalRow(buf.scores(j), buf.ids(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: PairTopK): Array[Byte] = {
    val bytes = new Array[Byte](4 + 16 * buf.n)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putDouble(buf.scores(j)); j += 1 }
    j = 0
    while (j < buf.n) { bb.putLong(buf.ids(j)); j += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): PairTopK = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new PairTopK(k)
    val n = bb.getInt()
    var j = 0
    while (j < n) { buf.scores(j) = bb.getDouble(); j += 1 }
    j = 0
    while (j < n) { buf.ids(j) = bb.getLong(); j += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPair =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPair =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(negScore = newChildren(0), id = newChildren(1))
  override def prettyName: String = if (distinct) "top_k_pair_distinct" else "top_k_pair"
}
