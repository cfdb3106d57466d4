package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-12 measurement harness (test-scope dev tool, not shipped
  * surface): per-stage wall/CPU/GC breakdown of s11_knn_graph_ivf on the
  * same synthetic 10× corpus the bench heavy tier builds, across several
  * back-to-back repetitions — the r11 verdict asks WHERE the 21-31 s
  * swing lives (compute? shuffle? GC?) before any fix is attempted (the
  * d22 lesson: the r9 "dominated by prefix build" note was stale and the
  * real cost was the verify join).
  * Run with `sbt "Test/runMain graft.tools.S11StageProbe"`. */
object S11StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // mirror the Bench session (see Bench.main for the rationale)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .appName("s11-stage-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the EXACT corpus the bench heavy tier measures — shared builder, so
    // the probe cannot drift from the bench recipe, and its shutdown hook
    // cleans the temp dir up (r12 review: the inline re-creation leaked
    // a parquet copy per probe run and would go stale on recipe changes)
    val dir = graft.Bench.buildHeavyDir(spark, "/root/testdata/sf0.1", copies = 10)

    case class St(name: String, wallMs: Long, cpuMs: Long, gcMs: Long,
        shufReadMB: Long, shufWriteMB: Long, spillMB: Long, tasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += St(
          s"stage${si.stageId} ${si.name.takeWhile(_ != '\n').take(60)}",
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorCpuTime / 1000000, m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead / 1048576,
          m.shuffleWriteMetrics.bytesWritten / 1048576,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576,
          si.numTasks)
      }
    })

    // rep 0 pays quantizer training (ivfPivots memoized per dir) like the
    // bench's first heavy pass; reps 1+ are the steady state min-of-3 sees
    for (rep <- 0 until 4) {
      stages.clear()
      System.gc()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("s11_knn_graph_ivf")(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain (private API in Spark 4)
      println(f"== rep $rep: wall $wall%.2f s, rows $n ==")
      stages.sortBy(-_.wallMs).take(8).foreach { s =>
        println(f"  ${s.wallMs}%6d ms wall  cpu ${s.cpuMs}%7d  gc ${s.gcMs}%6d  " +
          f"sR ${s.shufReadMB}%5d MB sW ${s.shufWriteMB}%5d MB spill ${s.spillMB}%5d MB  " +
          f"t=${s.tasks}%3d  ${s.name}")
      }
    }
    spark.stop()
  }
}
