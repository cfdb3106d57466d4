package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The z01 panel-memo contract (r14): after `prewarmLineagePanel`, a z01
  * invocation is PURE plan analysis — it executes no source scans (the
  * eager-construction members come from the memo) — and a repeated
  * prewarm runs no Spark jobs at all. Guards the zpanel_build / z01
  * separation the bench relies on: if a panel member with eager
  * construction is ever added without joining CheckpointedPanel (or the
  * memo regresses), the zero-read assertion fails here before the leak
  * muddies a bench round's lineage line. */
class PanelMemoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("panel-memo-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Run `body` with a stage-metrics listener attached (bus drained on
    * both sides so prior suites' stragglers don't leak in) and return
    * (source records read, stages completed) during it. */
  private def metered[A](body: => A): (A, Long, Int) = {
    org.apache.spark.sql.graft.ListenerBusDrain.drain(spark.sparkContext)
    @volatile var rec = 0L
    @volatile var stages = 0
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized { rec += sc.stageInfo.taskMetrics.inputMetrics.recordsRead; stages += 1 }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      org.apache.spark.sql.graft.ListenerBusDrain.drain(spark.sparkContext)
      (a, rec, stages)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("z01 after prewarm reads zero source records — analysis only") {
    SparkEntry.prewarmLineagePanel(spark, sf)
    val (n, rec, _) = metered {
      SparkEntry.queries("z01_lineage_extraction")(spark, sf).count()
    }
    assert(n == 17, s"panel size moved: $n")
    assert(rec == 0L,
      s"z01 executed source scans after prewarm ($rec records read) — an " +
        "eager-construction panel member is missing from CheckpointedPanel")
  }

  test("a repeated prewarm is a memo hit — no Spark jobs run") {
    SparkEntry.prewarmLineagePanel(spark, sf)
    val (_, _, stages) = metered { SparkEntry.prewarmLineagePanel(spark, sf) }
    assert(stages == 0, s"second prewarm ran $stages stages — memo not hit")
  }
}
