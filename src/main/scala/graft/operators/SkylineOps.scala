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
    * better on at least one. Ties (fully equal criteria) are all kept. */
  def skyline(df: DataFrame, maximize: Seq[String], minimize: Seq[String]): DataFrame = {
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
    df.mapPartitions(localSkyline)(enc)   // phase 1: per-partition, no shuffle
      .coalesce(1)
      .mapPartitions(localSkyline)(enc)   // phase 2: reduce the small union
  }
}
