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
}
