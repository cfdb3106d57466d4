package org.apache.spark.sql.graft

import scala.collection.mutable

/** Column-level lineage graph model.
  *
  * Re-derived from the reference's data model (see
  * /root/reference/src/main/scala/org/apache/spark/sql/flow/interfaces.scala:22-53):
  * a typed property graph whose nodes are tables / views / plan operators /
  * queries and whose edges connect column index → column index. `None`
  * indexes mean "node-level" (column unknown or the plan has no output).
  */
sealed trait FlowNodeType { def label: String }
object FlowNodeType {
  case object Table extends FlowNodeType { val label = "table" }
  case object View extends FlowNodeType { val label = "view" }
  case object Plan extends FlowNodeType { val label = "plan" }
  case object LeafPlan extends FlowNodeType { val label = "leaf_plan" }
  case object Query extends FlowNodeType { val label = "query" }
}

case class FlowNode(
    uniqueId: String,
    ident: String,
    attributes: Seq[String],
    schemaDDL: String,
    tpe: FlowNodeType,
    isCached: Boolean = false,
    props: mutable.Map[String, String] = mutable.Map.empty) {
  override def toString: String =
    s"FlowNode($uniqueId,$ident,[${attributes.mkString(",")}],${tpe.label},cached=$isCached)"
}

case class FlowEdge(
    fromId: String,
    fromIdx: Option[Int],
    toId: String,
    toIdx: Option[Int]) {
  /** Normalized "a":i -> "b":j form used by tests and the adjacency sink. */
  def show: String = {
    def f(id: String, idx: Option[Int]) = idx.map(i => s""""$id":$i""").getOrElse(s""""$id"""")
    s"${f(fromId, fromIdx)} -> ${f(toId, toIdx)}"
  }
}

/** Batch sink: write a whole graph at once. */
trait FlowBatchSink {
  def write(nodes: Seq[FlowNode], edges: Seq[FlowEdge], options: Map[String, String]): Unit
}

/** Stream sink: append per-query lineage increments (listener mode). */
trait FlowStreamSink {
  def append(nodes: Seq[FlowNode], edges: Seq[FlowEdge], options: Map[String, String]): Unit
}

/** Pure formatter — users can pass a lambda for custom formats. */
trait FlowFormat {
  def toGraphString(nodes: Seq[FlowNode], edges: Seq[FlowEdge]): String
}
