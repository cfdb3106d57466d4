package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkylineOps

/** Skyline operator: brute-force equivalence plus the size-guarded phase-2
  * fallback (an anti-correlated fixture where EVERY row is in the skyline —
  * the case where the single-task merge would receive the entire input). */
class SkylineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("skyline-spec")
    .getOrCreate()

  private def brute(rows: Seq[(Long, Double, Double)]): Set[(Long, Double, Double)] = {
    def dominates(a: (Long, Double, Double), b: (Long, Double, Double)): Boolean =
      a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)
    rows.filter(r => !rows.exists(o => dominates(o, r))).toSet
  }

  private def run(rows: Seq[(Long, Double, Double)], cap: Long): Set[(Long, Double, Double)] = {
    import spark.implicits._
    val df = rows.toDF("id", "score", "cost").repartition(8)
    SkylineOps.skyline(df, maximize = Seq("score"), minimize = Seq("cost"), singleTaskCap = cap)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
  }

  test("matches brute force on mixed data (single-task path)") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map(i => (i, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    assert(run(rows, cap = 1000000L) === brute(rows))
  }

  test("anti-correlated fixture: fallback triggers and keeps every point") {
    // higher score costs more: mutually non-dominated, so the local-skyline
    // union IS the input; cap=16 forces the iterated pairwise-reduction
    // path (union = 500 > 16)
    val rows = (1L to 500L).map(i => (i, i.toDouble, i.toDouble))
    val result = run(rows, cap = 16L)
    assert(result === rows.toSet, "fallback path must keep the full skyline")
  }

  test("both phase-2 paths agree on the same data") {
    val rnd = new scala.util.Random(7)
    // half anti-correlated (all survive among themselves), half random
    val rows = (1L to 300L).map(i => (i, i.toDouble, i.toDouble)) ++
      (301L to 600L).map(i => (i, rnd.nextInt(300).toDouble, rnd.nextInt(300).toDouble + 300.0))
    val single = run(rows, cap = 1000000L)
    val reduced = run(rows, cap = 1L)
    assert(single === reduced)
    assert(single === brute(rows))
  }

  test("duplicate criteria rows (ties) are all kept on both paths") {
    val rows = Seq((1L, 10.0, 5.0), (2L, 10.0, 5.0), (3L, 9.0, 6.0), (4L, 1.0, 1.0))
    // (4) survives: lower score but lower cost; (3) is dominated by (1)/(2)
    val expected = Set((1L, 10.0, 5.0), (2L, 10.0, 5.0), (4L, 1.0, 1.0))
    assert(run(rows, cap = 1000000L) === expected)
    assert(run(rows, cap = 1L) === expected)
  }
}
