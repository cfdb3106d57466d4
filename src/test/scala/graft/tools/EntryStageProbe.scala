package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-12 generalization of [[S11StageProbe]] (test-scope dev tool, not
  * shipped surface): per-stage wall/CPU/GC/shuffle/spill breakdown of ANY
  * heavy-tier entries on the exact 10× corpus Bench builds, with the same
  * prewarm scoping the bench applies. Args = entry names (default: the
  * top remaining heavy costs). Three reps per entry; rep 0 pays
  * memoized-trainer/prewarm costs exactly like the bench's first pass.
  * Run with `sbt "Test/runMain graft.tools.EntryStageProbe d22_prefix_filter_join"`. */
object EntryStageProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d22_prefix_filter_join", "d16_substring_dup",
        "t22_bpe_encode", "t08_doc_top_terms")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_FBT", "131072"))
      .appName("entry-stage-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_COPIES=1 probes the main-tier corpus shape (plain sf0.1)
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val dir =
      if (copies <= 1) "/root/testdata/sf0.1"
      else graft.Bench.buildHeavyDir(spark, "/root/testdata/sf0.1", copies = copies)

    case class St(name: String, wallMs: Long, cpuMs: Long, gcMs: Long,
        shufReadMB: Long, shufWriteMB: Long, spillMB: Long, tasks: Int)
    // appended from the listener-bus thread, read/cleared from the main
    // loop — all access under the buffer's own lock (the 500 ms drain
    // sleep below is a heuristic, not a barrier)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(
            s"stage${si.stageId} ${si.name.takeWhile(_ != '\n').take(70)}",
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            m.executorCpuTime / 1000000, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1048576,
            m.shuffleWriteMetrics.bytesWritten / 1048576,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576,
            si.numTasks)
        }
      }
    })

    // bench-equivalent prewarm scoping for the dedup family
    import graft.queries.DedupQueries.{SharedPairConsumers, SharedShingleConsumers, SharedSigConsumers}
    if (names.exists(SharedShingleConsumers)) {
      val t0 = System.nanoTime()
      graft.queries.DedupQueries.prewarmShared(spark, dir,
        names.exists(SharedPairConsumers), names.exists(SharedSigConsumers))
      println(f"prewarm ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (name <- names; rep <- 0 until 3) {
      stages.synchronized(stages.clear())
      System.gc()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain the listener bus (private API in Spark 4)
      println(f"== $name rep $rep: wall $wall%.2f s, rows $n ==")
      stages.synchronized(stages.sortBy(-_.wallMs).take(6).toList).foreach { s =>
        println(f"  ${s.wallMs}%6d ms wall  cpu ${s.cpuMs}%7d  gc ${s.gcMs}%6d  " +
          f"sR ${s.shufReadMB}%5d MB sW ${s.shufWriteMB}%5d MB spill ${s.spillMB}%5d MB  " +
          f"t=${s.tasks}%3d  ${s.name}")
      }
    }
    spark.stop()
  }
}
