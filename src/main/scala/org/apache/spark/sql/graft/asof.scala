package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join as a first-class physical operator (custom LogicalPlan +
  * SparkStrategy + SparkPlan — the "(c)" tier of the custom-op preference
  * order). Catalyst does carry a logical AsOfJoin (pandas merge_asof), but
  * RewriteAsOfJoin turns it into a join + per-key aggregate that buffers
  * candidate rows; this operator instead merges two co-partitioned sorted
  * streams with O(1) state per partition.
  *
  * For every left row, picks the single right row with the same key and the
  * LARGEST right-time <= left-time (left-outer semantics: unmatched left rows
  * keep nulls). Same semantics as DuckDB/Pandas `ASOF LEFT JOIN`.
  *
  * Scale design: both sides are hash-partitioned on the key (co-partitioned
  * by `EnsureRequirements`) and sorted (key, time) — the merge is then a
  * single forward pass per partition, O(|L|+|R|), with O(1) state (the
  * current candidate row). No per-key buffering, no window materialization:
  * at 100 TB this behaves exactly like a sort-merge join.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

/** `direction`: "backward" (largest right-time <= left-time, pandas
  * merge_asof's default), "forward" (smallest right-time >= left-time),
  * or "nearest" (smaller absolute distance wins; exact ties prefer the
  * backward row — deterministic). `tolerance`: maximum
  * |left-time - right-time| for a match, in the time column's NATIVE unit
  * (microseconds for timestamps) — candidates outside it emit nulls, like
  * an unmatched row. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => other.asInstanceOf[Number].longValue()
  }

  /** Key values, or null if ANY key is null (null keys never match,
    * standard join semantics). */
  private def keyOrNull(row: InternalRow, ks: Seq[Expression]): Array[Long] = {
    val a = new Array[Long](ks.length)
    var i = 0
    while (i < a.length) {
      val v = ks(i).eval(row)
      if (v == null) return null
      a(i) = asLong(v)
      i += 1
    }
    a
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lks = leftKeys.map(BindReferences.bindReference(_, AttributeSeq(leftOut)))
    val lt = BindReferences.bindReference(leftTime, AttributeSeq(leftOut))
    val rks = rightKeys.map(BindReferences.bindReference(_, AttributeSeq(rightOut)))
    val rt = BindReferences.bindReference(rightTime, AttributeSeq(rightOut))
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)

      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      var cand: InternalRow = null // copy of best right row for current key
      var candKey: Array[Long] = null
      var candTime: Long = 0L

      def advanceRight(): Unit = rNext = if (rIter.hasNext) rIter.next() else null

      lIter.map { lRow =>
        val key = keyOrNull(lRow, lks)
        val timeV = lt.eval(lRow)
        if (key == null || timeV == null) {
          // null key/time on the left never matches: emit unmatched
          toUnsafe(joiner(lRow, nullRight))
        } else if (direction != "forward") {
          // BACKWARD (and the backward half of NEAREST): remember the
          // latest same-key right row at-or-before each left time; the
          // candidate survives across left rows of the same key (left
          // times ascend, so it can only be superseded)
          val time = asLong(timeV)
          if (cand != null && !java.util.Arrays.equals(candKey, key)) cand = null
          var advancing = true
          while (advancing && rNext != null) {
            val rKeyV = keyOrNull(rNext, rks)
            val rTimeV = if (rKeyV == null) null else rt.eval(rNext)
            if (rKeyV == null || rTimeV == null) {
              // right rows with null key/time can never be candidates
              // (NULLS FIRST ordering puts them at the partition head)
              advanceRight()
            } else {
              val cmp = java.util.Arrays.compare(rKeyV, key)
              if (cmp < 0 || (cmp == 0 && asLong(rTimeV) <= time)) {
                if (cmp == 0) { cand = rNext.copy(); candKey = key; candTime = asLong(rTimeV) }
                advanceRight()
              } else {
                advancing = false
              }
            }
          }
          // tolerance only filters the final candidate: anything earlier is
          // farther from the left time, so no better in-tolerance row exists
          val bOk = cand != null && tolerance.forall(time - candTime <= _)
          if (direction == "nearest") {
            // the loop stopped exactly at the first same-key row AFTER the
            // left time (if any) — that unconsumed row IS the forward
            // candidate; closer absolute distance wins, ties go backward
            var fOk = false
            var fTime = 0L
            if (rNext != null) {
              val rKeyV = keyOrNull(rNext, rks)
              val rTimeV = if (rKeyV == null) null else rt.eval(rNext)
              if (rKeyV != null && rTimeV != null &&
                  java.util.Arrays.compare(rKeyV, key) == 0) {
                fTime = asLong(rTimeV)
                fOk = tolerance.forall(fTime - time <= _)
              }
            }
            val useForward = fOk && (!bOk || fTime - time < time - candTime)
            toUnsafe(joiner(lRow,
              if (useForward) rNext else if (bOk) cand else nullRight))
          } else {
            toUnsafe(joiner(lRow, if (bOk) cand else nullRight))
          }
        } else {
          // FORWARD: consume right rows strictly behind (smaller key, or
          // same key before the left time — later lefts only move forward,
          // so they can never match); the candidate is then rNext ITSELF,
          // left unconsumed because later left rows may match it too
          val time = asLong(timeV)
          var rKey: Array[Long] = null
          var rTime = 0L
          var advancing = true
          while (advancing && rNext != null) {
            val rKeyV = keyOrNull(rNext, rks)
            val rTimeV = if (rKeyV == null) null else rt.eval(rNext)
            if (rKeyV == null || rTimeV == null) advanceRight()
            else {
              val cmp = java.util.Arrays.compare(rKeyV, key)
              if (cmp < 0 || (cmp == 0 && asLong(rTimeV) < time)) advanceRight()
              else { advancing = false; rKey = rKeyV; rTime = asLong(rTimeV) }
            }
          }
          val matched = rNext != null && rKey != null &&
            java.util.Arrays.compare(rKey, key) == 0 &&
            tolerance.forall(rTime - time <= _)
          toUnsafe(joiner(lRow, if (matched) rNext else nullRight))
        }
      }
    }
  }
}

/** DataFrame-facing API: resolves key/time columns by name, builds the
  * logical node, and registers the planner strategy on first use. */
object AsOf {
  /** `direction`: "backward" (largest right-time <= left-time, the
    * default), "forward" (smallest right-time >= left-time), or "nearest"
    * (smaller absolute distance wins, exact ties prefer backward).
    * `tolerance`: maximum |left-time - right-time| in the time column's
    * native unit (microseconds for timestamps); out-of-tolerance left rows
    * emit nulls. Mirrors pandas merge_asof. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame =
    joinMulti(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      direction, tolerance)

  /** Composite-key variant: keys compare lexicographically. */
  def joinMulti(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
      "leftKeys/rightKeys must be non-empty and the same length")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be 'backward', 'forward', or 'nearest', got '$direction'")
    require(tolerance.forall(_ >= 0L), "tolerance must be non-negative")
    val l = left.asInstanceOf[ClassicDataset[_]]
    val r = right.asInstanceOf[ClassicDataset[_]]
    val session = l.sparkSession
    // registration is a read-check-write on shared session state
    session.experimental.synchronized {
      if (!session.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
        session.experimental.extraStrategies =
          session.experimental.extraStrategies :+ AsOfJoinStrategy
      }
    }
    // resolve by the session's resolver (case-insensitive by default, like
    // every other column-by-name API)
    val resolver = session.sessionState.analyzer.resolver
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${plan.output.map(_.name).mkString(", ")}]"))
    def check(a: Attribute, what: String): Attribute = a.dataType match {
      case LongType | TimestampType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.TimestampNTZType => a
      case dt => throw new IllegalArgumentException(s"$what must be integral/timestamp, got $dt")
    }
    val lp = l.queryExecution.analyzed
    val rp0 = r.queryExecution.analyzed
    // self-join safety: if the right side shares output ExprIds with the
    // left (same base plan), re-alias its output so the join's output
    // attributes are distinct and downstream binding cannot cross sides
    val rp: LogicalPlan =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    val lt0 = check(resolve(lp, leftTime), "leftTime")
    val rt0 = check(resolve(rp, rightTime), "rightTime")
    // The merge compares raw time values, so both sides must live on the
    // same axis: plain integers may mix widths (one user-defined unit), and
    // the two timestamp encodings may mix — but NOT by comparing raw micros
    // (TIMESTAMP is anchored at the UTC instant, NTZ at the wall clock;
    // they only coincide when the wall clock IS UTC). When the encodings
    // mix, the NTZ side is converted through the session timezone — the
    // same coercion Spark applies to a mixed BinaryComparison — so the
    // merge always compares instants, under any session zone. What the
    // guard still rejects is a timestamp against an integer of arbitrary
    // units, where the comparison and any tolerance are meaningless.
    val ntz = org.apache.spark.sql.types.TimestampNTZType
    // the instant key is APPENDED as a synthetic column, never substituted
    // for the user's NTZ column: the merge compares instants, but the join
    // OUTPUT must keep the original column with its original type and
    // wall-clock values (a final Project below drops the synthetic)
    def toInstantAxis(plan: LogicalPlan, a: Attribute): (LogicalPlan, Attribute) = {
      val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
      val synth = Alias(Cast(a, TimestampType, tz), "__asof_instant")()
      val proj = org.apache.spark.sql.catalyst.plans.logical.Project(
        plan.output :+ synth, plan)
      (proj, proj.output.last)
    }
    val (lpF, ltF, rpF, rtF) = (lt0.dataType, rt0.dataType) match {
      case (`ntz`, TimestampType) =>
        val (p, t) = toInstantAxis(lp, lt0); (p, t, rp, rt0)
      case (TimestampType, `ntz`) =>
        val (p, t) = toInstantAxis(rp, rt0); (lp, lt0, p, t)
      case _ => (lp, lt0, rp, rt0)
    }
    val sameAxis = (ltF.dataType, rtF.dataType) match {
      case (org.apache.spark.sql.types.IntegerType | LongType,
            org.apache.spark.sql.types.IntegerType | LongType) => true
      case (TimestampType, TimestampType) | (`ntz`, `ntz`) => true
      case _ => false
    }
    require(sameAxis,
      s"leftTime (${ltF.dataType}) and rightTime (${rtF.dataType}) must be on the same " +
        "time axis: both integral, or both timestamps")
    val node = AsOfJoin(lpF, rpF,
      leftKeys.map(k => check(resolve(lpF, k), "leftKey")),
      rightKeys.map(k => check(resolve(rpF, k), "rightKey")),
      ltF, rtF,
      direction = direction, tolerance = tolerance)
    // mixed-encoding coercion appended a synthetic instant column; restore
    // the user-facing schema (original columns, original types/values —
    // right-side nullability adjustments carried over from node.output)
    val restored =
      if (lpF.eq(lp) && rpF.eq(rp)) node
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        (lp.output ++ rp.output).map(a => node.output.find(_.exprId == a.exprId).get), node)
    ClassicDataset.ofRows(session, restored)
  }
}

/** `SparkSessionExtensions` hook for cluster-wide registration via
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`:
  * the custom planner strategies AND every native SQL function, so a
  * session configured with the extension needs no per-session
  * `functions.registerAll` call (ExtensionsSpec drives this path through
  * a real conf-built session). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => TailStrategy)
    functions.sqlBuilders.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "org.apache.spark.sql.graft.functions", name),
        builder))
    }
  }
}
