package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r19, verdict item 2): characterize the `lineage_plans_per_sec`
  * measurement itself — the one driver metric with no adjudicator band,
  * after the r18 driver sample came in at plain 1221 / contracted 2446
  * plans/s vs committed 3124/3184 (0.39× / 0.77×) with no verdict row.
  *
  * The r18-shipped Bench protocol times the modes SEQUENTIALLY: three
  * plain windows, then three contracted windows, max per mode. Anything
  * transient at the start of the lineage section — C2 recompilation after
  * the heavy tier's code-cache churn, a contention burst, a driver GC
  * backlog — therefore lands on PLAIN alone, which is exactly the
  * asymmetric fingerprint the driver printed. This probe runs BOTH
  * orderings in one JVM and prints every window sample:
  *   - `seq`: plain ×N then contracted ×N (the r18 protocol);
  *   - `ilv`: alternating plain/contracted pairs ×N (the r19 protocol) —
  *     both modes sample the same window-quality distribution, so a
  *     section-start transient hits both or neither.
  * Args: [warmupReps] [windows] (defaults 1 and 3 — the r18-shipped
  * values). Run several JVMs to sample run-scoped JIT modes:
  *   sbt "Test/runMain graft.tools.LineageRateProbe" (×3)
  */
object LineageRateProbe {
  def main(args: Array[String]): Unit = {
    val warmupReps = args.headOption.map(_.toInt).getOrElse(1)
    val windows = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.buffer.pageSize",
        sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "8m"))
      .appName("lineage-rate-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.graft.SQLFlow
    // the exact Bench panel
    val panel = Seq("q01_pricing_summary", "q05_local_supplier",
      "q07_window_topk", "q10_cube", "q12_union_all", "q16_scalar_subquery",
      "q19_anti_join", "q23_explode_tokens", "q38_asof_join",
      "d03_minhash_lsh", "s01_knn_brute", "m03_feature_extract")
    val dfs = panel.map(n => graft.SparkEntry.queries(n)(spark, sfDir))
    var w = 0
    while (w < warmupReps) {
      dfs.foreach { df =>
        SQLFlow.datasetGraph(df); SQLFlow.datasetGraph(df, contracted = true)
      }
      w += 1
    }
    def window(contracted: Boolean): Double = {
      val reps = 50
      System.gc()
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) {
        dfs.foreach(df => SQLFlow.datasetGraph(df, contracted = contracted))
        i += 1
      }
      reps * dfs.size / ((System.nanoTime() - t0) / 1e9)
    }
    def show(tag: String, xs: Seq[Double]): Unit =
      println(s"  $tag samples=${xs.map(v => f"$v%.0f").mkString("[", ", ", "]")} " +
        f"max=${xs.max}%.0f")
    println(s"[lineage-rate-probe] warmupReps=$warmupReps windows=$windows sf=$sfDir")
    println("— seq ordering (r18 protocol: all plain, then all contracted) —")
    show("plain     ", Seq.fill(windows)(window(contracted = false)))
    show("contracted", Seq.fill(windows)(window(contracted = true)))
    println("— ilv ordering (r19 protocol: alternating pairs) —")
    val pairs = Seq.fill(windows)((window(contracted = false), window(contracted = true)))
    show("plain     ", pairs.map(_._1))
    show("contracted", pairs.map(_._2))
    spark.stop()
  }
}
