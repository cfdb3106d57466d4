package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 dev tool: decompose s11's burner coefficient into its two candidate
  * mechanisms — the bandwidth-bound candidate SCORING loop (every candidate
  * reads two ~256 B embedding arrays; ~77 GB of memory traffic on the 10×
  * corpus) versus the bounded TOP-K aggregation's hash-random buffer
  * probes. Runs the same candidate pipeline twice per rep:
  *
  *   score_only — identical join + vec_dot scoring, but reduced by a
  *                stateless sum(score): no per-group state, no hash-agg
  *                buffer working set;
  *   full_s11   — the shipped entry (scoring + distinct bounded top-k).
  *
  * Compare each variant's quiet-vs-burn ratio (SPARK_GRAFT_BURN_THREADS /
  * SPARK_GRAFT_PRESSURE_MB, the EntryStageProbe protocol): if score_only
  * carries the same coefficient as full_s11, the fragility lives in the
  * memory-bus physics of exact candidate scoring, not in aggregate state,
  * and no top-k layout change can move it. */
object S11FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_FBT", "131072"))
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // mirror the bench session's r18 geometry pin (see Bench.scala) so
      // probe timings compare 1:1 whatever heap the probe JVM got
      .config("spark.buffer.pageSize",
        sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "8m"))
      .appName("s11-floor-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val dir =
      if (copies <= 1) "/root/testdata/sf0.1"
      else graft.Bench.buildHeavyDir(spark, "/root/testdata/sf0.1", copies = copies)

    // same contention knobs as EntryStageProbe
    sys.env.get("SPARK_GRAFT_BURN_THREADS").map(_.toInt).filter(_ > 0).foreach { n =>
      println(s"contention: starting $n busy-spin burner threads")
      (0 until n).foreach { i =>
        val t = new Thread(() => {
          val buf = new Array[Long](2 * 1024 * 1024)
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
      val rows = mb.toLong * 1024
      val filler = spark.range(rows).toDF("id")
        .withColumn("pad", expr(
          "concat_ws('', transform(sequence(1, 32), i -> md5(concat(cast(id as string), '-', i))))"))
        .persist()
      println(s"pressure: persisting ~${mb} MB filler (${filler.count()} rows)")
    }

    graft.queries.SimilarityQueries.prewarmMemos(spark, dir, Set("s11_knn_graph_ivf"))

    import graft.queries.SimilarityQueries.{ivfAssigned, ivfPivots, topPivotIds, IvfNprobe}
    import org.apache.spark.sql.graft.functions.{vec_dot, vec_norm}

    def scoredCandidates() = {
      val pivots = ivfPivots(spark, dir)
      val assigned = ivfAssigned(spark, dir)
      val probes = graft.queries.QueryDsl.spread(graft.queries.QueryDsl.tbl(spark, dir, "embeddings"))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          vec_norm(col("embedding")).as("q_nrm"),
          explode(topPivotIds(pivots, col("embedding"), 3 * IvfNprobe)).as("pivot_id"))
      val denom = col("q_nrm") * col("nrm")
      assigned.withColumn("nrm", vec_norm(col("embedding")))
        .join(probes, "pivot_id")
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          when(denom === 0.0, 0.0)
            .otherwise(vec_dot(col("q_emb"), col("embedding")) / denom).as("score"))
    }

    def cpuOf(f: => Unit): Double = {
      val agg = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          agg.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime / 1000000)
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      println(f"   wall $wall%.2f s")
      agg.get() / 1000.0
    }

    for (rep <- 0 until 3) {
      System.gc()
      val so = cpuOf { scoredCandidates().agg(sum("score")).collect() }
      // + the both-directions explode, still reduced statelessly: isolates
      // the generate/materialization cost from the hash-agg buffer probes
      val ex = cpuOf {
        val fwd = scoredCandidates()
        fwd.select(explode(array(
            struct(col("query_id"), col("neighbor_id"), col("score")),
            struct(col("neighbor_id").as("query_id"), col("query_id").as("neighbor_id"),
              col("score")))).as("e"))
          .select("e.query_id", "e.neighbor_id", "e.score")
          .agg(sum("score")).collect()
      }
      val full = cpuOf {
        graft.SparkEntry.queries("s11_knn_graph_ivf")(spark, dir).count()
      }
      // r19 verdict lever (b): pin the top_k_pair aggregate under the
      // SORT-BASED aggregation paths — sequential group order means each
      // group's packed buffer stays cache-hot across consecutive updates,
      // killing the hash-random probe pattern that is s11's measured
      // CPI-contention mechanism. Two pins, measured in the SAME JVM/rep
      // as the hash path so JIT mode and contention state are shared:
      //   fbt128  — ObjectHashAggregateExec's own sort-based fallback at
      //             the Spark-default 128-group threshold (the r12 path:
      //             hash the first 128 groups, external-sort the rest);
      //   sortagg — useObjectHashAggregateExec=false, i.e. a planner-level
      //             SortAggregateExec with an explicit Sort below it.
      // Both pay a sort of the ~3e8-row candidate stream to buy the
      // sequential probe order; the question the r19 verdict asks is
      // whether that price undercuts the hash path's contention tail.
      // Conf set/reset around the action: physical planning happens at
      // execution, so the toggle scopes exactly one run. Results are
      // strategy-agnostic (the TopKPair sort-based-fallback spec pins it).
      def pinned(key: String, v: String, restore: String): Double = {
        spark.conf.set(key, v)
        try cpuOf { graft.SparkEntry.queries("s11_knn_graph_ivf")(spark, dir).count() }
        finally spark.conf.set(key, restore)
      }
      // fbt128 measured 494-633 cpu_s (r20 quiet probe, 3 reps) — the r12
      // external-sort-of-every-candidate pathology, definitively rejected;
      // skippable so repeat probe sessions don't pay ~30 s wall per rep
      // re-measuring a dead variant (SPARK_GRAFT_SKIP_FBT=1 prints -1).
      val fbt =
        if (sys.env.get("SPARK_GRAFT_SKIP_FBT").contains("1")) -1.0
        else pinned("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "128", sys.env.getOrElse("SPARK_GRAFT_FBT", "131072"))
      val sortagg = pinned("spark.sql.execution.useObjectHashAggregateExec",
        "false", "true")
      // verdict candidate (a): sort the candidate stream by group key so
      // the partial aggregate's buffer probes are sequential (each group's
      // buffer stays cache-hot) — measures whether the sort's own cost
      // buys back more than the scattered probes lose
      val sorted = cpuOf {
        import org.apache.spark.sql.graft.functions.top_k_pair_distinct
        val fwd = scoredCandidates()
        val cand = fwd.select(explode(array(
            struct(col("query_id"), col("neighbor_id"), col("score")),
            struct(col("neighbor_id").as("query_id"), col("query_id").as("neighbor_id"),
              col("score")))).as("e"))
          .select("e.query_id", "e.neighbor_id", "e.score")
          .sortWithinPartitions("query_id")
        cand.groupBy("query_id")
          .agg(top_k_pair_distinct(col("score") * -1, col("neighbor_id"), 5).as("top"))
          .select(col("query_id"), posexplode(col("top"))).count()
      }
      println(f"== rep $rep: score_only cpu_s $so%.1f, explode_sum cpu_s $ex%.1f, " +
        f"full_s11 cpu_s $full%.1f, sorted_topk cpu_s $sorted%.1f, " +
        f"fbt128 cpu_s $fbt%.1f, sortagg cpu_s $sortagg%.1f ==")
    }
    spark.stop()
  }
}
