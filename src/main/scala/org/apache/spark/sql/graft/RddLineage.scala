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
  * `localCheckpoint()` barriers get the WEAKER of the two treatments: a
  * [[CheckpointSummary]] records only the source plan's LEAF set, and the
  * analyzer emits one "checkpoint" node with node-level edges from those
  * leaves (r12 verdict item 5). Full column stitching is deliberately NOT
  * applied there — those barriers truncate plan history on purpose
  * (iterative algorithms would otherwise re-expand every superseded
  * iteration into the lineage graph — q80's eight PageRank rounds, d22's
  * shared subtrees), and retaining just the leaves closes the
  * which-tables-fed-this blind spot without retaining any superseded
  * plan. Both registrations are explicit acts by the producing operator.
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

  /** A localCheckpoint barrier's lineage summary: the checkpointed plan's
    * LEAF plans (table scans, ranges, earlier checkpoint LogicalRDDs —
    * never the full plan, so superseded iterations stay dropped) plus a
    * display name. An iterative chain resolves transitively: round i's
    * leaves include round i-1's checkpoint RDD, whose own summary is
    * looked up when the analyzer materializes the leaf — the chain's
    * value→key references collect in cascade once the head plan is
    * unreachable (WeakHashMap semantics). */
  case class CheckpointSummary(leaves: Seq[LogicalPlan], opName: String)

  private val reg = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[RDD[_], Derivation]())

  private val ckpts = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[RDD[_], CheckpointSummary]())

  def register(rdd: RDD[_], d: Derivation): Unit = reg.put(rdd, d)

  def lookup(rdd: RDD[_]): Option[Derivation] = Option(reg.get(rdd))

  def registerCheckpoint(rdd: RDD[_], s: CheckpointSummary): Unit = ckpts.put(rdd, s)

  def lookupCheckpoint(rdd: RDD[_]): Option[CheckpointSummary] = Option(ckpts.get(rdd))
}
