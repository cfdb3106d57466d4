package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query inventory.
  *
  * Oracle-parity rules (the driver hash-compares Spark vs DuckDB results
  * THROUGH PANDAS — see BUILD_NOTES.md "pandas-dtype sensitive"):
  *   - Never sum raw doubles: cast to DECIMAL first. Decimal addition is
  *     exact and associative, so results are deterministic under any
  *     partial-aggregation / partition order on a 1000-executor cluster,
  *     and bit-identical to DuckDB's decimal arithmetic.
  *   - Cast every final decimal aggregate to DOUBLE in BOTH engines (NOT to
  *     a decimal type: Spark parquet decimals reach pandas as Decimal
  *     objects, DuckDB's as float64, and "123.40" != "123.4"). One
  *     correctly-rounded conversion of an exact value is deterministic.
  *     Caveat past ~2^53: DuckDB's DECIMAL→DOUBLE double-rounds — round()
  *     final statistics coarser than the ulp noise there (see q52).
  *   - Integer sums: CAST(SUM(..) AS BIGINT) in DuckDB (HUGEINT → float64).
  *   - Alias every computed column identically in Spark and the oracle SQL.
  */
object QueryDsl {
  type Q = (SparkSession, String) => DataFrame

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Register parquet tables as temp views for spark.sql-based queries. */
  def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => tbl(s, dir, n).createOrReplaceTempView(n))

  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark reads as Long under
    * spark.sql.legacy.parquet.nanosAsLong=true, set by every entry point)
    * vs TIMESTAMP(MICROS) (read natively as a timestamp). Normalize both
    * to one session-zoned microsecond TIMESTAMP column; with the UTC
    * session timezone every entry point sets, the two paths are
    * value-identical. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = tbl(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Spread a SMALL input across the session's cores before a
    * compute-heavy projection (winnowing, image codecs): a one-row-group
    * parquet file is ONE split, which serializes the per-row work on one
    * core regardless of cluster size — and AQE coalesces a bare
    * repartition of a few thousand tiny rows straight back (the d17
    * lesson, BUILD_NOTES). At corpus scale the scan already yields
    * thousands of splits and this is a NO-OP — the round-robin shuffle
    * only fires when the scan undershoots the session's parallelism, so
    * it never moves more than one undersized input's worth of data. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** The ONE gate every operator-path driver-side collect routes through
    * (r11 verdict item 7): a collect in a build path is legitimate ONLY
    * for artifacts that are driver-sized BY CONSTRUCTION — sketch cells
    * (d·w), trained centroids/codebooks (k), partition-count offset
    * tables, an explicitly limit()ed top slice. `limit` states that
    * construction bound and the require turns a violated assumption into
    * a loud failure instead of a silent driver OOM at 100 TB. The
    * CollectBoundSpec source scan enforces that no raw `.collect()`
    * bypasses this helper in operator/query sources. */
  def boundedCollect(df: DataFrame, limit: Long, what: String): Array[org.apache.spark.sql.Row] = {
    // take(limit + 1), NOT collect-then-check: a violated bound must fail
    // BEFORE the driver materializes an unbounded result, or the gate
    // reproduces the very OOM it exists to prevent (r12 review). In the
    // conforming case take returns the full row set (sort order preserved
    // for ordered inputs — TakeOrderedAndProject); every call site is
    // either explicitly ordered or key-addressed, never partition-order
    // dependent.
    require(limit > 0, s"$what: bound $limit must be positive")
    // Bounds past the JVM array ceiling clamp the overflow probe instead
    // of failing the require (r12 advice: GraphOps callers pass
    // 2*maxDriverPairs, which can exceed Int.MaxValue even when the
    // actual result is tiny). Below the ceiling the check stays exact;
    // at/above it take() cannot return more than the clamp anyway, so
    // the bound is unfalsifiable here — a >2^31-row driver materialize
    // would fail in the JVM long before this gate could.
    val probe = (math.min(limit, Int.MaxValue - 2L) + 1).toInt
    val rows = df.take(probe)
    require(rows.length <= limit,
      s"$what: driver-side collect exceeded declared construction bound " +
        s"$limit rows — not a driver-sized artifact")
    rows
  }

  /** Exact 2-decimal monetary cast (testdata doubles are 2-decimal clean). */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  val D2 = "decimal(38,2)"
  val D4 = "decimal(38,4)"
}
