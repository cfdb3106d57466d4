package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.expressions.{IntegerLiteral, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Tail}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.{CollectTailExec, SparkPlan, SparkStrategy}

/** Lazy wrappers for logical operators the public Dataset API only exposes
  * as eager actions.
  *
  * `Dataset.tail(n)` collects immediately; the underlying [[Tail]] logical
  * node is only planned by Spark when it sits at the ROOT under
  * `ReturnAnswer` — composed under any other operator, planning fails with
  * "No plan for Tail". [[TailStrategy]] closes that gap by planning any
  * Tail as `CollectTailExec` (whose `doExecute` exists in Spark 4), so
  * `tail` below returns a fully composable DataFrame. Lives in this
  * package because `Dataset.ofRows` is private[sql]. */
object TailStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Tail(IntegerLiteral(n), child) => CollectTailExec(n, planLater(child)) :: Nil
    case _ => Nil
  }
}

object PlanIntrospection {
  /** The physical plan of `df` with the adaptive wrapper peeled off.
    *
    * [[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]] is a
    * LeafExecNode, so `executedPlan.collect { ... }` on an AQE query
    * silently matches NOTHING below the wrapper — a plan-shape assertion
    * written that way passes vacuously. Tests must unwrap first (lives
    * here because the accessor is private[sql]). */
  def physicalPlan(df: Dataset[_]): SparkPlan =
    unwrap(df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan)

  /** The same adaptive unwrap for an already-materialized [[SparkPlan]] —
    * e.g. an `InMemoryRelation.cachedPlan`, which AQE wraps exactly like a
    * root plan. NOTE: one level only — once a plan has EXECUTED, its final
    * plan nests further `QueryStageExec` leaves that stay opaque to
    * `collect`; shape assertions that must survive execution order should
    * traverse with [[flatten]] instead. */
  def unwrap(plan: SparkPlan): SparkPlan = plan match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a.executedPlan
    case p => p
  }

  /** Every node of `plan`, descending through the adaptive runtime's leaf
    * wrappers (`AdaptiveSparkPlanExec` and materialized `QueryStageExec`
    * stages) that `SparkPlan.collect` treats as opaque leaves — the
    * order-robust way to assert plan shape whether or not the plan (or a
    * cached subtree of it) has already run. */
  def flatten(plan: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // unwrap to fixpoint: a wrapper's payload can itself be a wrapper
    // (e.g. an adaptive root whose final plan IS a query stage)
    @annotation.tailrec
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => strip(a.executedPlan)
      case q: QueryStageExec => strip(q.plan)
      case other => other
    }
    val p = strip(plan)
    p +: p.children.flatMap(flatten)
  }
}

object PlanOps {

  /** The last `n` rows of `ds` in its current ordering, as a lazy
    * DataFrame. Deterministic when `ds` is sorted. */
  def tail(ds: Dataset[Row], n: Int): DataFrame = {
    val cds = ds.asInstanceOf[ClassicDataset[Row]]
    val session = cds.sparkSession
    // registration is a read-check-write on shared session state
    session.experimental.synchronized {
      if (!session.experimental.extraStrategies.contains(TailStrategy)) {
        session.experimental.extraStrategies =
          session.experimental.extraStrategies :+ TailStrategy
      }
    }
    ClassicDataset.ofRows(session, Tail(Literal(n), cds.logicalPlan))
  }
}
