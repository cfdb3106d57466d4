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
      // mirror the bench session (r15): with the default 100-entry
      // generated-class cache a probe of 1-2 entries never evicts, but the
      // conf must match so probe and bench sessions stay comparable
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // mirror the bench session (r18): Tungsten page size pinned to the
      // canonical 8 GB-heap value so probe cpu/peak_mem compare 1:1
      // against bench_details.json whatever heap the probe JVM runs
      // under. SPARK_GRAFT_PAGE_SIZE overrides for geometry-dose
      // experiments (an explicit .config beats a -D system property, so
      // the env knob is the only way to unpin).
      .config("spark.buffer.pageSize",
        sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "8m"))
      .appName("entry-stage-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_COPIES=1 probes the main-tier corpus shape (plain sf0.1)
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val dir =
      if (copies <= 1) "/root/testdata/sf0.1"
      else graft.Bench.buildHeavyDir(spark, "/root/testdata/sf0.1", copies = copies)

    case class St(name: String, wallMs: Long, cpuMs: Long, gcMs: Long,
        shufReadMB: Long, shufWriteMB: Long, spillMB: Long, tasks: Int,
        recRead: Long, shufRecW: Long, peakMemMB: Long)
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
            si.numTasks,
            m.inputMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten,
            m.peakExecutionMemory >> 20)
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
    // r15: the bench's shared_build line also force-builds d15's assignment
    // table and the cross-pass trainer/index memos — mirror it so probed
    // entries see the same prewarm state the bench measures them under
    if (names.exists(graft.queries.DedupQueries.SemdedupConsumers)) {
      graft.queries.DedupQueries.prewarmSemdedup(spark, dir)
    }
    if (names.exists(graft.queries.DedupQueries.LshIndexConsumers)) {
      graft.queries.DedupQueries.prewarmLshIndex(spark, dir)
    }
    graft.queries.SimilarityQueries.prewarmMemos(spark, dir, names.toSet)

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
    // SPARK_GRAFT_BURN_THREADS: spawn N daemon busy-spin threads for the
    // duration of the reps — SIMULTANEOUS CPU contention (with
    // SPARK_GRAFT_PRESSURE_MB for the memory side) reproducing a contended
    // container INSIDE a controlled probe. The question this answers (r13
    // verdict item 1): does an allocation-heavy entry's task cpu_s itself
    // inflate under contention with IDENTICAL work (record counts flat)?
    // The burners touch a 16 MB private array each so they consume memory
    // bandwidth (cache-miss CPI pressure), not just scheduler slots — a
    // pure spin loop would run entirely in registers and leave the memory
    // system idle, which is not what a co-tenant container does.
    sys.env.get("SPARK_GRAFT_BURN_THREADS").map(_.toInt).filter(_ > 0).foreach { n =>
      println(s"contention: starting $n busy-spin burner threads (16 MB working set each)")
      (0 until n).foreach { i =>
        val t = new Thread(() => {
          val buf = new Array[Long](2 * 1024 * 1024) // 16 MB — larger than L2, streams through LLC
          var x = 0x9E3779B97F4A7C15L + i
          var j = 0
          while (true) {
            x = x * 6364136223846793005L + 1442695040888963407L
            buf((j & (buf.length - 1))) = x
            x ^= buf(((j * 31) & (buf.length - 1)))
            j += 1
          }
        }, s"burner-$i")
        t.setDaemon(true)
        t.setPriority(Thread.MIN_PRIORITY + 1)
        t.start()
      }
    }
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
      // "zpanel_build" probes the bench's checkpoint-construction line
      // (r14 verdict item 3 wants a coefficient for every >=10 s-cpu line,
      // and this one is a build, not a query). It is memoized per
      // (session, dir), so only rep 0 measures real work — compare rep 0
      // across separate probe JVMs (quiet vs burn), not reps within one.
      val n =
        if (name == "zpanel_build") { graft.SparkEntry.prewarmLineagePanel(spark, dir); -1L }
        else graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain the listener bus (private API in Spark 4)
      // entry-level totals: cpu_s is the contention-sensitive column, the
      // record counters are the work-invariance check (identical counts
      // across quiet/contended reps = same work, whatever cpu_s did)
      // peak_mem uses the EXACT aggregation Bench's Telemetry publishes
      // (max over stages of the stage's summed per-task execution-memory
      // peaks) so probe numbers compare 1:1 against bench_details.json —
      // the r16 d22 REOPEN's distinguishing signal was this column
      // (960 -> 6279 MB at bit-identical counters)
      val (tCpu, tGc, tRec, tSRec, tSpill, tPeak) = stages.synchronized {
        (stages.map(_.cpuMs).sum / 1000.0, stages.map(_.gcMs).sum / 1000.0,
          stages.map(_.recRead).sum, stages.map(_.shufRecW).sum, stages.map(_.spillMB).sum,
          if (stages.isEmpty) 0L else stages.map(_.peakMemMB).max)
      }
      println(f"== $name rep $rep: wall $wall%.2f s, rows $n, cpu_s $tCpu%.1f, " +
        f"gc_s $tGc%.1f, records_read $tRec, shuffle_records $tSRec, spill_mb $tSpill, " +
        f"peak_mem_mb $tPeak ==")
      // JVM-wide compile/class/memory-pool state after the rep: the
      // run-scoped excursion classes (d18 r14/r15, s10 pre-r16) are
      // JIT/codegen-resource stories, and these counters are the direct
      // evidence a "same work, 6x cpu" rep needs to name one
      locally {
        val comp = java.lang.management.ManagementFactory.getCompilationMXBean
        val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
        import scala.jdk.CollectionConverters._
        val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
          .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
          .map(p => f"${p.getName.trim}=${p.getUsage.getUsed >> 20}%dMB")
          .mkString(" ")
        println(f"  [jvm] compile_ms_total ${comp.getTotalCompilationTime}, " +
          f"classes loaded ${cls.getLoadedClassCount} (total ${cls.getTotalLoadedClassCount}), $pools")
      }
      stages.synchronized(stages.sortBy(-_.wallMs).take(6).toList).foreach { s =>
        println(f"  ${s.wallMs}%6d ms wall  cpu ${s.cpuMs}%7d  gc ${s.gcMs}%6d  " +
          f"sR ${s.shufReadMB}%5d MB sW ${s.shufWriteMB}%5d MB spill ${s.spillMB}%5d MB  " +
          f"peak ${s.peakMemMB}%5d MB  t=${s.tasks}%3d  ${s.name}")
      }
      storage(s"$name rep$rep")
    }
    spark.stop()
  }
}
