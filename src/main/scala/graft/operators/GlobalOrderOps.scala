package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact GLOBAL order statistics (1-based row number, running sums) under a
  * total order — without the single-task plan that `Window.orderBy` with no
  * `PARTITION BY` produces (Spark plans that window as ONE task holding the
  * whole corpus: the textbook driver-shaped bottleneck, WindowExec even
  * warns "No Partition Defined ... may cause serious performance
  * degradation").
  *
  * This is the classic two-phase distributed prefix computation:
  *
  *   1. ONE range-repartition + partition-local sort on the order columns —
  *      the same single shuffle a global `orderBy` costs, and the only
  *      corpus-sized data movement in the algorithm;
  *   2. one eager `localCheckpoint` pins partition identity (the q81
  *      single-materialization pattern — both later passes must see the
  *      same physical partitions, and re-planning a range exchange is not
  *      guaranteed to reproduce them because the range sampler is not
  *      seeded by the data);
  *   3. a per-partition (count, sum) pass — P rows to the driver, bounded
  *      by the shuffle-partition count, NOT the corpus (the same bounded-
  *      driver-artifact class as the IVF centroid tables);
  *   4. exclusive prefix offsets over those P rows on the driver, then a
  *      partition-local streaming pass (`mapPartitionsWithIndex`) adds
  *      `offset + local position` / `offset + local running sum`. This is
  *      the one place `mapPartitions` genuinely earns its keep: the local
  *      pass is per-partition imperative O(1)-state streaming, and doing it
  *      relationally (a window over `spark_partition_id()`) would force a
  *      SECOND corpus-wide hash shuffle because Catalyst cannot see that
  *      the checkpointed rows are already clustered by physical partition.
  *
  * The emitted values are parallelism-INVARIANT: range partitioning
  * preserves the total order across any partition count, so
  * `offset + local rank` is the global rank whether the corpus is split 5
  * ways or 5000 (the cross-parallelism determinism gate relies on this).
  * Callers must pass a TOTAL order (include a unique tiebreak column —
  * equal keys straddling a range boundary would otherwise make ranks
  * sampler-dependent).
  *
  * Scale shape at 100 TB: one range shuffle of the projected columns, P
  * driver-side longs, one narrow streaming pass. Skewed order keys skew the
  * range partitions exactly as they would a global sort — raise
  * `numPartitions` (or pre-aggregate) the same way.
  */
object GlobalOrderOps {

  /** Append `rankCol` (1-based global row number, LongType) — and, for each
    * (input, output) pair in `runningSums`, the inclusive global running
    * sum of the LongType input column — to `df` under the total order
    * `orderBy`. */
  def withGlobalOrder(
      df: DataFrame,
      orderBy: Seq[Column],
      rankCol: String = "global_rank",
      runningSums: Seq[(String, String)] = Nil): DataFrame = {
    val spark = df.sparkSession
    val sumIdx = runningSums.map { case (in, _) => df.schema.fieldIndex(in) }
    runningSums.foreach { case (in, _) =>
      require(df.schema(in).dataType == LongType,
        s"running-sum column '$in' must be LongType (the integer-units " +
          "oracle discipline): cast monetary values to exact integer cents " +
          "first")
    }

    // Phase 1+2: the one corpus shuffle, pinned by a single materialization.
    val sorted = df.repartitionByRange(orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .localCheckpoint()
    val rdd = sorted.rdd

    // Phase 3: per-partition counts and sums — P rows total.
    val partStats: Array[(Long, Array[Long])] = rdd
      .mapPartitions { it =>
        var n = 0L
        val sums = Array.fill(sumIdx.size)(0L)
        it.foreach { row =>
          n += 1
          var i = 0
          while (i < sums.length) {
            if (!row.isNullAt(sumIdx(i))) sums(i) += row.getLong(sumIdx(i))
            i += 1
          }
        }
        Iterator((n, sums))
      }
      .collect() // bounded: one (count, sums) row per partition, require()d below
    // driver-sized BY CONSTRUCTION: exactly one (count, sums) row per
    // partition — P entries, never data-proportional (the RDD-API sibling
    // of QueryDsl.boundedCollect; CollectBoundSpec admits this site via
    // the line marker above + the require below)
    require(partStats.length == rdd.getNumPartitions,
      s"partition stats collect: got ${partStats.length} rows for " +
        s"${rdd.getNumPartitions} partitions")

    // Phase 4a: exclusive prefix offsets over the P partition stats.
    val rankOffsets = new Array[Long](partStats.length)
    val sumOffsets = Array.ofDim[Long](partStats.length, sumIdx.size)
    var accN = 0L
    val accS = Array.fill(sumIdx.size)(0L)
    for (p <- partStats.indices) {
      rankOffsets(p) = accN
      Array.copy(accS, 0, sumOffsets(p), 0, accS.length)
      accN += partStats(p)._1
      for (i <- accS.indices) accS(i) += partStats(p)._2(i)
    }

    // Phase 4b: partition-local streaming pass, O(1) state per partition.
    val outSchema = StructType(sorted.schema.fields ++
      (StructField(rankCol, LongType, nullable = false) +:
        runningSums.map { case (_, out) => StructField(out, LongType, nullable = false) }))
    val bcRank = spark.sparkContext.broadcast(rankOffsets)
    val bcSums = spark.sparkContext.broadcast(sumOffsets)
    val nSums = sumIdx.size
    val sumIdxArr = sumIdx.toArray
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = bcRank.value(pid)
      val run = bcSums.value(pid).clone()
      it.map { row =>
        rank += 1
        val extra = new Array[Any](1 + nSums)
        extra(0) = rank
        var i = 0
        while (i < nSums) {
          if (!row.isNullAt(sumIdxArr(i))) run(i) += row.getLong(sumIdxArr(i))
          extra(1 + i) = run(i)
          i += 1
        }
        Row.fromSeq(row.toSeq ++ extra)
      }
    }
    val out = spark.createDataFrame(outRdd, outSchema)

    // Register the output's derivation so column lineage flows THROUGH the
    // RDD boundary instead of truncating at the LogicalRDD leaf (the r9-r11
    // design-noted gap): input columns pass through positionally; the rank
    // column derives from the order columns (they decide every rank); each
    // running sum derives from its summed input plus the order columns.
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LogicalSort}
    import org.apache.spark.sql.graft.RddLineage
    // resolve the order columns by running them through one analysis-only
    // probe (sortWithinPartitions plans no job) and mapping the resolved
    // SortOrder references onto the source output BY exprId — exact, where
    // name-matching the unresolved Columns would guess
    val (srcPlan, orderIdx) =
      df.sortWithinPartitions(orderBy: _*).queryExecution.analyzed match {
        case srt: LogicalSort =>
          val srcOutA = srt.child.output
          (srt.child, srt.order.flatMap(_.references.toSeq)
            .map(a => srcOutA.indexWhere(_.exprId == a.exprId))
            .filter(_ >= 0).distinct)
        case _ => (df.queryExecution.analyzed, Seq.empty[Int])
      }
    val appended = (rankCol -> orderIdx) +: runningSums.zipWithIndex.map {
      case ((_, outName), i) => outName -> (sumIdx(i) +: orderIdx).distinct
    }
    out.queryExecution.logical.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach { internalRdd =>
      RddLineage.register(internalRdd,
        RddLineage.Derivation(srcPlan, appended, "GlobalOrder"))
    }
    out
  }
}
