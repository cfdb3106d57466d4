package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of each remaining batch/stream sketch-twin hash
  * contract — the [[CountSketch]] treatment (r10 advice) applied to the
  * other three families. Every pair below carries a cross-file
  * "interchangeable with the batch build" claim (build on the stream,
  * query in batch): KMV (q78/q81 ↔ kmvDistinctStream), Count-Min
  * (q86 ↔ cmsFreqStream), HyperLogLog (q85 ↔ hllDistinctStream). Before
  * this object each side re-declared its hash/estimator expressions, so
  * a tweak to one silently broke the interchange contract the
  * StreamingSpec twins and the DuckDB oracles pin.
  *
  * All hashes are md5-derived (the t07 trick) so every sketch replays
  * bit-for-bit in the oracle; 56 bits (14 hex chars) is the shared
  * domain — it keeps (k−1)·2^56 and Σ 2^(51−rho) inside a signed Long.
  */
object SketchHash {

  /** 56-bit md5 of the key's string form — the shared hash domain of the
    * KMV bottom-k sketch and the HLL register stream. */
  def md5_56(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 14), 16, 10).cast("long")

  /** Count-Min cell bucket: [[md5_56]] of "row|key" mod w — an
    * independent hash per counter row via the row-index prefix, composed
    * from the shared domain (concat_ws already yields a string, so the
    * inner cast is a no-op the optimizer removes). */
  def cmsBucket(r: Column, key: Column, w: Int): Column =
    md5_56(concat_ws("|", r, key)) % w

  /** Bar-Yossef KMV estimate (k−1)·2^56 DIV h_k as exact integer
    * arithmetic, collapsing to the exact count while the sketch still
    * holds the whole key set. `kthCol`/`nCol` name the caller's kth-hash
    * and kept/exact-count columns. k ≤ 128 keeps (k−1)·2^56 < 2^63. */
  def kmvEstimate(k: Int, kthCol: String, nCol: String): Column = {
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    expr(s"CASE WHEN $nCol >= $k THEN ${(k - 1).toLong}L * ${1L << 56}L DIV $kthCol " +
      s"ELSE CAST($nCol AS BIGINT) END")
  }

  /** HLL register index: the top 6 bits of the 56-bit hash (64 registers). */
  def hllReg(h: Column): Column = shiftright(h, 50)

  /** HLL rank rho: leading-zero rank of the remaining 50 bits, via
    * length(bin(w)) — exact integer in any engine; an all-zero remainder
    * saturates at 51 (the paper's w=0 convention at 50 value bits). */
  def hllRho(h: Column): Column = {
    val mask = (1L << 50) - 1
    val w = h.bitwiseAND(lit(mask))
    when(w === 0, lit(51)).otherwise(lit(51) - length(bin(w)))
  }
}
