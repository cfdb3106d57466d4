package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalOrderOps

/** GlobalOrderOps — the two-phase distributed prefix computation that
  * replaces the single-task no-PARTITION window (q95's cumulative weights,
  * t24's global deciles). */
class GlobalOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("global-order-spec")
    .getOrCreate()

  import spark.implicits._

  // deliberately adversarial: duplicate keys (tiebreak id), negative and
  // zero weights, a heavy-hitter key (range-partition skew), shuffled input
  private def fixture = {
    val rows = (1 to 997).map { i =>
      val key = if (i % 7 == 0) 42L else (i % 101).toLong
      (key, i.toLong, ((i % 23) - 5).toLong)
    }
    // scramble input order so nothing depends on the incoming layout
    new scala.util.Random(7).shuffle(rows).toDF("k", "id", "w")
  }

  test("global rank and running sum equal the single-task window reference") {
    val got = GlobalOrderOps.withGlobalOrder(fixture,
      Seq(col("k"), col("id")), rankCol = "rk", runningSums = Seq("w" -> "cum"))
    val w = Window.orderBy("k", "id")
    val ref = fixture
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum",
        sum("w").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.select("k", "id", "w", "rk", "cum").except(ref).isEmpty)
    assert(ref.except(got.select("k", "id", "w", "rk", "cum")).isEmpty)
    assert(got.count() === 997)
  }

  test("ranks are parallelism-invariant: 2 vs 16 range partitions agree row-for-row") {
    // range partitioning preserves the total order under ANY partition
    // count, so offset + local rank must be identical — the property the
    // cross-parallelism determinism gate (5 vs 16 threads) rests on
    val a = GlobalOrderOps.withGlobalOrder(fixture.repartition(2),
      Seq(col("k"), col("id")), rankCol = "rk", runningSums = Seq("w" -> "cum"))
    val b = GlobalOrderOps.withGlobalOrder(fixture.repartition(16),
      Seq(col("k"), col("id")), rankCol = "rk", runningSums = Seq("w" -> "cum"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("extreme key skew: 90% duplicate keys stay parallelism-invariant under the tiebreak") {
    // a heavy-hitter key spanning several range-partition boundaries is
    // exactly where a NON-total order would give sampler-dependent ranks;
    // with the unique tiebreak the output must not care how the range
    // partitioner splits the run of equal keys
    val rows = (1 to 2000).map { i =>
      (if (i % 10 == 0) i.toLong * 7 else 1L, i.toLong, (i % 13).toLong)
    }
    val df = new scala.util.Random(3).shuffle(rows).toDF("k", "id", "w")
    val a = GlobalOrderOps.withGlobalOrder(df.repartition(3),
      Seq(col("k"), col("id")), rankCol = "rk", runningSums = Seq("w" -> "cum"))
    val b = GlobalOrderOps.withGlobalOrder(df.repartition(13),
      Seq(col("k"), col("id")), rankCol = "rk", runningSums = Seq("w" -> "cum"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val w = Window.orderBy("k", "id")
    val ref = df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum",
        sum("w").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(a.except(ref).isEmpty && ref.except(a).isEmpty)
  }

  test("descending order and multiple running sums") {
    val got = GlobalOrderOps.withGlobalOrder(fixture,
      Seq(col("k").desc, col("id")), rankCol = "rk",
      runningSums = Seq("w" -> "cum_w", "id" -> "cum_id"))
    val w = Window.orderBy(col("k").desc, col("id"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = fixture
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum_w", sum("w").over(frame))
      .withColumn("cum_id", sum("id").over(frame))
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
  }

  test("null weights are skipped like SUM skips them (running total carries over)") {
    val df = Seq((1L, Some(5L)), (2L, None: Option[Long]), (3L, Some(7L)))
      .toDF("id", "w")
    val got = GlobalOrderOps.withGlobalOrder(df, Seq(col("id")),
        rankCol = "rk", runningSums = Seq("w" -> "cum"))
      .orderBy("id").select("id", "rk", "cum")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 12L)))
  }

  test("non-Long running-sum input is rejected with the integer-units message") {
    val df = Seq((1L, 1.5)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      GlobalOrderOps.withGlobalOrder(df, Seq(col("id")), runningSums = Seq("w" -> "cum"))
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("the plan never contains a single-task corpus window") {
    // the whole point of the kernel: q95/t24 must not plan WindowExec over
    // SinglePartition on corpus-sized input. t24's only no-PARTITION
    // window runs over its 10-row decile aggregate — assert every
    // single-partition window in both plans sits above an Aggregate
    // (bounded by construction), never directly above the scan/exchange
    // of corpus rows.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.graft.PlanIntrospection
    val sf = "/root/testdata/sf0.001"
    Seq("q95_pps_sample", "t24_score_lift").foreach { name =>
      val plan = PlanIntrospection.physicalPlan(SparkEntry.queries(name)(spark, sf))
      def hasAggBelow(p: SparkPlan): Boolean =
        p.exists { case _: BaseAggregateExec => true; case _ => false }
      val offending = plan.collect {
        case w: WindowExec
            if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
      }
      assert(offending.isEmpty,
        s"$name plans a corpus-sized single-task window: ${offending.mkString}")
    }
  }

  test("q95 on an empty orders table reports emptiness, not an NPE") {
    // sum() over zero rows is SQL null — the query must surface its own
    // require message (total > 0), not a NullPointerException (r9 advice)
    val tmp = java.nio.file.Files.createTempDirectory("graft-q95-empty")
    try {
      spark.range(0).selectExpr("id AS o_orderkey", "CAST(1.0 AS DECIMAL(12,2)) AS o_totalprice")
        .write.mode("overwrite").parquet(tmp.resolve("orders.parquet").toString)
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q95_pps_sample")(spark, tmp.toString).collect()
      }
      // the message must diagnose EMPTINESS, not claim a Long overflow
      // that never happened (r10 review)
      assert(e.getMessage.contains("empty or all-zero"))
    } finally {
      import java.nio.file.Files
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }

  test("q95 systematic PPS invariants: exactly m picks, multiplicity-weighted") {
    // Madow's systematic selection draws exactly m picks counting
    // multiplicity, and every pick's order really exists
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q95_pps_sample")(spark, sf)
    assert(got.agg(sum("n_picks")).head.getLong(0) === 37L)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(got.join(orders, "o_orderkey").count() === got.count())
    // selection probability is proportional to weight: no selected order
    // can be outweighed 37× by the mean without multiplicity ≥ its share
    val heavy = got.filter(col("n_picks") > 1)
    heavy.select("cents").as[Long].collect().foreach { c =>
      assert(c > 0)
    }
  }

  test("t24 lift-table invariants: deciles partition the corpus, capture is monotone to 1000") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("t24_score_lift")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    assert(rows.map(_.getLong(1)).sum === 500L)
    val captures = rows.map(_.getLong(3))
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b })
    assert(captures.last === 1000L)
  }
}
