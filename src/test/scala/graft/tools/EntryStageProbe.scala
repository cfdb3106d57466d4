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

    // cached-block census: is every shared/persisted RDD still fully IN
    // MEMORY, or has storage pressure pushed blocks to disk (or dropped
    // them → silent recompute)? The r12 driver-vs-builder d22 envelope
    // question is exactly this (verdict item 1).
    def storage(tag: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      if (infos.isEmpty) println(s"  [storage $tag] no cached RDDs")
      infos.sortBy(-_.memSize).take(8).foreach { i =>
        println(f"  [storage $tag] rdd${i.id}%4d ${i.numCachedPartitions}%3d/${i.numPartitions}%3d cached  " +
          f"mem ${i.memSize >> 20}%5d MB disk ${i.diskSize >> 20}%5d MB  ${i.name.take(60)}")
      }
    }
    // SPARK_GRAFT_PRESSURE_MB: persist a dummy table of ~that size before
    // the reps — a stand-in for the storage/heap state a full-inventory
    // driver run accumulates, to see whether the shared caches get pushed
    // to disk and what that does to the consumers
    sys.env.get("SPARK_GRAFT_PRESSURE_MB").map(_.toInt).filter(_ > 0).foreach { mb =>
      // INCOMPRESSIBLE ~1 KB pad per row (a constant pad RLE-compressed
      // to nothing in the columnar cache — measured 5 MB for a nominal
      // 3 GB). 32 chained md5s → 1024 hex chars that survive
      // compression; mb * 1024 rows ≈ mb MB of payload. Size against the
      // PROBE heap: default SPARK_DRIVER_MEM=8g → ~4.6 GB storage pool,
      // so 3000 already forces real storage competition
      val rows = mb.toLong * 1024
      val filler = spark.range(rows).toDF("id")
        .withColumn("pad", org.apache.spark.sql.functions.expr(
          "concat_ws('', transform(sequence(1, 32), i -> md5(concat(cast(id as string), '-', i))))"))
        .persist()
      println(s"pressure: persisting ~${mb} MB filler (${filler.count()} rows)")
    }
    storage("post-prewarm")

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
      storage(s"$name rep$rep")
    }
    spark.stop()
  }
}
