package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Registry stitching column lineage across `createDataFrame(RDD)`
  * boundaries.
  *
  * An operator that leaves SQL for a genuinely imperative per-partition pass
  * (GlobalOrderOps' two-phase prefix computation is the one such site in this
  * engine) re-enters as a [[org.apache.spark.sql.execution.LogicalRDD]] leaf,
  * and [[FlowAnalysis]] would otherwise truncate lineage there — the r9-r11
  * design-noted gap. The operator knows exactly how its output derives from
  * its input, so it records that derivation here, keyed by the LogicalRDD's
  * backing RDD (identity semantics; weak keys so the registry never outlives
  * the plans it annotates), and the analyzer resumes the walk through the
  * recorded source plan.
  *
  * Deliberately NOT applied to `localCheckpoint()` barriers: those truncate
  * plan history on purpose (iterative algorithms would otherwise re-expand
  * every superseded iteration into the lineage graph — q80's eight PageRank
  * rounds, d22's shared subtrees), and their checkpoint is an execution
  * detail, not an operator boundary. Registration is an explicit act by an
  * operator that wants its lineage to flow through.
  */
object RddLineage {

  /** How an RDD-backed output derives from `source`:
    *   - output column i < source.output.length is positionally the source's
    *     column i (the imperative pass carries input rows through unchanged);
    *   - appended output column `source.output.length + j` derives from the
    *     source columns at `appended(j)._2` (empty ⇒ unknown: the analyzer
    *     falls back to a node-level edge for that column). */
  case class Derivation(source: LogicalPlan, appended: Seq[(String, Seq[Int])],
      opName: String)

  private val reg = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[RDD[_], Derivation]())

  def register(rdd: RDD[_], d: Derivation): Unit = reg.put(rdd, d)

  def lookup(rdd: RDD[_]): Option[Derivation] = Option(reg.get(rdd))
}
