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

/** [[TopKPair]]'s per-group state is ONE `Array[Long]` — the k smallest
  * (neg_score, id) pairs held sorted ascending, INTERLEAVED:
  *
  *   a(0) = n;   slot j:  a(1+2j) = raw score bits,  a(2+2j) = id
  *
  * r19 packing (the r16 design held the pairs in a wrapper object + two
  * parallel primitive arrays — 3 separately-allocated heap objects per
  * group): on the kNN-graph tier the partial ObjectHashAggregate holds
  * ~20k group buffers per task probed in HASH-RANDOM order, so per-group
  * footprint and pointer-chase depth ARE the cache working set — the
  * r13-r16 measured CPI fragility of s11 under cache contention. One
  * array removes two dereferences per probe and puts the whole state in
  * one contiguous allocation (k=5 → 88 B + header ≈ 2 cache lines, vs
  * ~150 B across three scattered objects); interleaving makes the
  * reject fast path — compare against slot n−1 only, the fate of ~all
  * candidate rows once the heap is warm — touch ONE adjacent (score, id)
  * pair instead of one line in each of two arrays. Scores are stored as
  * RAW bits (`doubleToRawLongBits`, NaN payloads preserved), so the
  * round-trip is bit-identical to the previous Array[Double] state and
  * the ordering semantics (compareDoubles on the VALUE) are unchanged.
  * Versus [[TopKStruct]]'s PriorityQueue of per-row UnsafeRows (~2-3
  * objects + a byte[] PER KEPT ROW) this remains the flat kernel. */
private[graft] object PairTopK {
  def alloc(k: Int): Array[Long] = new Array[Long](1 + 2 * k)
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
  *   - insertion keeps the slots sorted (k is small — single-digit — so
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
  extends TypedImperativeAggregate[Array[Long]] {

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

  override def createAggregationBuffer(): Array[Long] = PairTopK.alloc(k)

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

  /** Interleaved-slot accessors over the packed buffer (see [[PairTopK]]):
    * slot j's score bits at 1+2j, id at 2+2j, n at 0. */
  @inline private def slotScore(buf: Array[Long], j: Int): Double =
    java.lang.Double.longBitsToDouble(buf(1 + 2 * j))
  @inline private def slotId(buf: Array[Long], j: Int): Long = buf(2 + 2 * j)

  private def insert(buf: Array[Long], s: Double, i: Long): Unit = {
    val n = buf(0).toInt
    // reject fast path — the fate of ~all candidate rows once the heap is
    // warm: one comparison against the adjacent (score, id) pair of the
    // LAST kept slot, the interleaving's whole point
    if (n == k && cmp(s, i, slotScore(buf, k - 1), slotId(buf, k - 1)) >= 0) return
    if (distinct) {
      var j = 0
      while (j < n) {
        if (cmp(s, i, slotScore(buf, j), slotId(buf, j)) == 0) return
        j += 1
      }
    }
    var j = n - 1
    while (j >= 0 && cmp(slotScore(buf, j), slotId(buf, j), s, i) > 0) j -= 1
    val pos = j + 1
    // slots [pos, last) shift one slot right in a single overlapping
    // arraycopy (interleaving keeps each slot's pair adjacent, so the
    // shifted region is contiguous); the old last slot falls off when full
    val last = if (n == k) k - 1 else n
    System.arraycopy(buf, 1 + 2 * pos, buf, 1 + 2 * (pos + 1), 2 * (last - pos))
    buf(1 + 2 * pos) = java.lang.Double.doubleToRawLongBits(s)
    buf(2 + 2 * pos) = i
    if (n < k) buf(0) = n + 1
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

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
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

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val m = other(0).toInt
    var j = 0
    while (j < m) {
      insert(buf, slotScore(other, j), slotId(other, j))
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0).toInt
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      out(j) = InternalRow(slotScore(buf, j), slotId(buf, j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Wire format unchanged from r16 (4 + 16·n bytes, scores then ids) —
    * the partial-state-per-exchange-row claim the scale story rests on.
    * Score bytes are the RAW bit pattern (putLong of the stored bits), so
    * serialize∘deserialize is bit-identical even on noncanonical NaNs. */
  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = buf(0).toInt
    val bytes = new Array[Byte](4 + 16 * n)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(n)
    var j = 0
    while (j < n) { bb.putLong(buf(1 + 2 * j)); j += 1 }
    j = 0
    while (j < n) { bb.putLong(buf(2 + 2 * j)); j += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = PairTopK.alloc(k)
    val n = bb.getInt()
    buf(0) = n
    var j = 0
    while (j < n) { buf(1 + 2 * j) = bb.getLong(); j += 1 }
    j = 0
    while (j < n) { buf(2 + 2 * j) = bb.getLong(); j += 1 }
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
