package graft.tools

import org.apache.spark.sql.SparkSession

/** r20 dev tool: quantify the guide-§1.4 concern against THIS bench's
  * timed action. `Bench.time` drives every entry with `.count()`; the
  * optimizer may prune a map-only entry's projection expressions under
  * the count (a Project does not change cardinality), so such entries'
  * bench numbers could be measuring scan+count instead of the operator.
  * For each named query (args, default = a map-only sample), run
  * count() and a noop-sink write in the same JVM and print both CPU
  * times — if noop ≫ count on an entry, the count path under-measures
  * that entry and the timed action is a candidate for the documented
  * measurement-bug fix; if they track, the pruning concern does not
  * apply to this inventory's shapes.
  */
object NoopVsCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .appName("noop-vs-count-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def cpuOf(f: => Unit): Double = {
      val agg = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          agg.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime / 1000000)
      }
      spark.sparkContext.addSparkListener(l)
      f
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(l)
      agg.get() / 1000.0
    }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q02_filter_project", "m03_feature_extract", "t15_pii_redact",
      "t17_gopher_repetition", "q25_regexp_json", "t08_doc_top_terms")
    for (rep <- 0 until 2; n <- names) {
      val cnt = cpuOf { graft.SparkEntry.queries(n)(spark, dir).count() }
      val noop = cpuOf {
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"== rep $rep $n%-24s count cpu_s $cnt%7.2f  noop cpu_s $noop%7.2f  ratio ${noop / math.max(cnt, 0.001)}%5.2f ==")
    }
    spark.stop()
  }
}
