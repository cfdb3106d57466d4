package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Distributed skyline (Pareto-optimal set) operator.
  *
  * Pattern from the skyline-on-Spark literature (e.g. "Integration of
  * Skyline Queries into Spark SQL", EDBT 2023): the skyline is
  * union-decomposable, so phase 1 computes a LOCAL skyline per partition
  * (map-side, no shuffle) and phase 2 reduces the union of local skylines —
  * which is tiny for any realistic dominance structure — to the global
  * skyline on one task. At 100 TB the data-sized pass is embarrassingly
  * parallel and only |local skylines| rows move.
  */
object SkylineOps {

  /** Rows not dominated by any other row: `b` dominates `a` when b is >= a
    * on every `maximize` column, <= on every `minimize` column, and strictly
    * better on at least one. Ties (fully equal criteria) are all kept.
    *
    * Phase 2 is size-guarded: when the local-skyline union exceeds
    * `singleTaskCap` (anti-correlated data, where local skylines barely
    * prune), the single-task merge would receive the whole input — instead
    * we fall back to an iterated pairwise reduction that halves the
    * partition count per round, re-pruning at each step. Each round is a
    * `repartition` (a real stage boundary — a `coalesce` chain is narrow
    * and would pipeline into one task, i.e. exactly the `coalesce(1)` we
    * are avoiding), so every merge task holds only the surviving rows of
    * two prior partitions. The skyline merge is confluent (the global
    * skyline of a union is independent of merge order), so the result SET
    * is identical on either path. */
  def skyline(
      df: DataFrame,
      maximize: Seq[String],
      minimize: Seq[String],
      singleTaskCap: Long = 1000000L): DataFrame = {
    val schema = df.schema
    val maxIdx = maximize.map(schema.fieldIndex).toArray
    val minIdx = minimize.map(schema.fieldIndex).toArray

    def value(r: Row, i: Int): Double = r.getAs[Number](i).doubleValue()

    def dominates(a: Row, b: Row): Boolean = {
      var strict = false
      var j = 0
      while (j < maxIdx.length) {
        val x = value(a, maxIdx(j)); val y = value(b, maxIdx(j))
        if (x < y) return false
        if (x > y) strict = true
        j += 1
      }
      j = 0
      while (j < minIdx.length) {
        val x = value(a, minIdx(j)); val y = value(b, minIdx(j))
        if (x > y) return false
        if (x < y) strict = true
        j += 1
      }
      strict
    }

    def localSkyline(it: Iterator[Row]): Iterator[Row] = {
      val buf = ArrayBuffer[Row]()
      it.foreach { r =>
        if (!buf.exists(dominates(_, r))) {
          val surviving = buf.filterNot(dominates(r, _))
          buf.clear()
          buf ++= surviving
          buf += r
        }
      }
      buf.iterator
    }

    val enc = Encoders.row(schema)
    // phase 1 is rebuilt per consumer instead of persisted: in the
    // anti-correlated case the local-skyline union is input-sized, so a
    // cache would pin ~the whole dataset; a second narrow scan is the
    // scale-safe price of the size probe
    def phase1: DataFrame = df.mapPartitions(localSkyline)(enc)
    val unionSize = phase1.count()
    if (unionSize <= singleTaskCap) {
      // benign dominance structure: ship the tiny union to one task.
      // repartition, NOT coalesce: coalesce(1) is narrow, which would make
      // the single merge task execute phase 1 over every input partition
      // itself — phase 1 must stay parallel, only the pruned union moves
      phase1.repartition(1).mapPartitions(localSkyline)(enc)
    } else {
      // anti-correlated fallback: iterated pairwise reduction, halving the
      // partition count per round; every round is a shuffle boundary so
      // each merge task holds only the surviving rows of ~2 partitions
      var cur = phase1
      var parts = df.rdd.getNumPartitions
      while (parts > 1) {
        parts = (parts + 1) / 2
        cur = cur.repartition(parts).mapPartitions(localSkyline)(enc)
      }
      cur
    }
  }
}
