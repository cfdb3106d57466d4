package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, conv, lit, md5, substring}

/** The ONE definition of the Count-Sketch hash family (Charikar, Chen &
  * Farach-Colton 2002) shared by every consumer that must stay
  * cell-for-cell interchangeable: q105's batch build + probe, the
  * streaming twin [[graft.streaming.StreamingOps.countSketchCellsStream]]
  * (whose cells must equal the batch sketch of the net multiset), the
  * SketchIngestSpec median recomputation, and — via interpolation of the
  * constants — q105's DuckDB oracle. Before this object the b/g
  * expressions and the d/w defaults were copy-paste-maintained in three
  * places (r10 advice); a tweak to any one of them silently broke the
  * build-on-stream/query-in-batch contract.
  *
  * Contract: both hash families take the key as an explicit Column
  * (BIGINT-castable; the old expr-string form resolved a column literally
  * named `k`, which silently hashed the wrong column in any schema that
  * happened to contain an unrelated `k` — r11 advice) and share ONE md5
  * of "i:k" per hash row: h_i(k) is
  * its first 32 bits mod w, g_i(k) ∈ {±1} the parity of its bits 33-64.
  * Disjoint bit ranges of one digest are the standard way to draw the
  * (h, g) pair — modeled independent, and it matters for throughput:
  * b/g appear side by side in every consumer's projection, so
  * whole-stage codegen's subexpression elimination computes the digest
  * ONCE per (row, i) — the previous "i:k"/"gi:k" split forced 2·d md5s
  * per input row, and the md5 pass dominated q105's build side. Still
  * md5-derived (the t07 trick) so the whole sketch replays bit-for-bit
  * in the oracle.
  */
object CountSketch {

  /** d — number of hash rows. Must stay ODD: the median estimator reads
    * the stored middle of d sorted per-row estimates ([[MedianIdx]]); an
    * even count would need a midpoint average, which is no longer a
    * stored integer. */
  val Rows: Int = 5

  /** w — buckets per hash row. d·w longs is the sketch's entire state. */
  val Width: Int = 64

  /** 1-based index of the stored median among [[Rows]] sorted per-row
    * estimates — interpolated into both engines so the median can never
    * drift if [[Rows]] is tuned. */
  val MedianIdx: Int = (Rows + 1) / 2

  /** The ONE md5 both families draw from — semantically identical subtrees
    * in bucket/sign, so whole-stage codegen's subexpression elimination
    * computes it once per (row, i). */
  private def digest(key: Column, i: Int): Column =
    md5(concat(lit(s"$i:"), key.cast("string")))

  /** h_i(key): the bucket of `key` in hash row i. */
  def bucket(key: Column, i: Int, w: Int = Width): Column =
    conv(substring(digest(key, i), 1, 8), 16, 10).cast("long") % w

  /** g_i(key) ∈ {±1}: the sign of `key` in hash row i — bits 33-64 of the
    * SAME digest [[bucket]] reads bits 1-32 of (hex chars 9-16), so
    * codegen shares the md5. */
  def sign(key: Column, i: Int): Column =
    lit(1) - lit(2) * (conv(substring(digest(key, i), 9, 8), 16, 10).cast("long") % 2)

  /** All d (bucket, sign) pairs for a BIGINT key as ONE native-kernel
    * array — ARRAY<STRUCT<b, g>> with exactly the [[bucket]]/[[sign]]
    * values in hash-row order (r21, guide §4: the hex-column pipeline
    * paid a fresh MessageDigest + hex encode + two substring/base-16
    * reparses per (row, i); the kernel reads the digest bytes directly —
    * ExpressionsSpec pins bit-parity against the column form, and
    * SketchIngestSpec's independent bucket/sign recompute cross-checks
    * every cell). Consumers posexplode it, so `pos` is the hash-row
    * index i, exactly like the literal array-of-structs it replaces. */
  def pairs(key: Column, d: Int = Rows, w: Int = Width): Column =
    org.apache.spark.sql.graft.functions.count_sketch_pairs(key, d, w)
}
