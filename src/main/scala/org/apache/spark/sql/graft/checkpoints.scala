package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Release helpers for `localCheckpoint`ed Datasets.
  *
  * `Dataset.unpersist()` talks to the CacheManager, which does NOT track
  * checkpoint blocks — a localCheckpoint'ed Dataset is backed by a directly
  * persisted RDD inside a `LogicalRDD` leaf (private[sql], hence this
  * package). Iterative algorithms that checkpoint per round (GraphOps'
  * min-label propagation) must unpersist THAT RDD or every round pins a
  * full snapshot in the block manager for the life of the session.
  */
object CheckpointUtils {

  /** The persisted RDD backing a localCheckpoint'ed Dataset, if any. */
  def checkpointRdd(ds: Dataset[_]): Option[RDD[_]] =
    ds.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l.rdd
    }

  /** Drop the checkpoint's blocks (non-blocking). Safe on non-checkpointed
    * Datasets: does nothing. */
  def unpersistCheckpoint(ds: Dataset[_]): Unit =
    checkpointRdd(ds).foreach(_.unpersist(blocking = false))

  /** `localCheckpoint()` + lineage summary (r12 verdict item 5): records
    * the checkpointed plan's LEAF set in [[RddLineage]], so FlowAnalysis
    * emits one "checkpoint" node fed (node-level) by the true source
    * tables instead of a blind LogicalRDD leaf. Only the leaves are
    * retained — superseded iterative plans stay dropped, which is the
    * whole point of the barrier. Use everywhere a query-path
    * localCheckpoint would otherwise truncate the visible lineage. */
  def summarized[T](ds: Dataset[T], opName: String = "checkpoint"): Dataset[T] = {
    val leaves = ds.asInstanceOf[ClassicDataset[T]]
      .queryExecution.analyzed.collectLeaves()
    val out = ds.localCheckpoint()
    checkpointRdd(out).foreach(r =>
      RddLineage.registerCheckpoint(r, RddLineage.CheckpointSummary(leaves, opName)))
    out
  }

  /** `.summarizedCheckpoint()` as a chainable method — the drop-in
    * replacement for `.localCheckpoint()` at query-path call sites. */
  implicit class SummarizedCheckpointOps[T](private val ds: Dataset[T]) extends AnyVal {
    def summarizedCheckpoint(opName: String = "checkpoint"): Dataset[T] =
      CheckpointUtils.summarized(ds, opName)
  }
}
