package org.apache.spark.sql.graft

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.command.{CreateDataSourceTableAsSelectCommand, DataWritingCommand}
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.util.QueryExecutionListener

/** Continuous lineage auditing: appends per-query lineage to a stream sink
  * after every successful (non-Command) query, stamping duration/timestamp
  * props on the query node (reference: listeners.scala:49-67).
  *
  * Register programmatically
  * (`spark.listenerManager.register(SQLFlowListener(...))`) or via
  * `spark.sql.queryExecutionListeners=org.apache.spark.sql.graft.ConfSQLFlowListener`
  * with `spark.sql.flow.sink.outputDirPath=...` in the session conf.
  */
case class SQLFlowListener(
    graphSink: FlowStreamSink,
    contracted: Boolean = false,
    options: Map[String, String] = Map.empty)
  extends QueryExecutionListener with Logging {

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    // write-command lineage (INSERT / CTAS / save): the reference skips ALL
    // commands (its Issue #5); we extract the command's source query and
    // point it at the write target instead
    val planAndRoot: Option[(LogicalPlan, String, FlowNodeType)] = qe.optimizedPlan match {
      case d: DataWritingCommand =>
        val target = d match {
          case i: InsertIntoHadoopFsRelationCommand =>
            i.catalogTable.map(_.qualifiedName).getOrElse(i.outputPath.getName)
          case ct: CreateDataSourceTableAsSelectCommand => ct.table.qualifiedName
          case other => other.nodeName
        }
        // the command's child is analyzed but not optimized — optimize here
        val optimized = scala.util.Try(
          org.apache.spark.sql.SparkSession.active
            .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
            .sessionState.optimizer.execute(d.query)).getOrElse(d.query)
        Some((optimized, target, FlowNodeType.Table))
      case _: Command => None // other commands skipped, as the reference does
      case plan => Some((plan, s"query_${math.abs(qe.hashCode).toString}", FlowNodeType.Query))
    }
    planAndRoot.foreach { case (plan, rootName, rootType) =>
      try {
        val g = FlowAnalysis.analyze(plan, rootName, rootType)
        val (nodes, edges) =
          if (contracted) FlowAnalysis.contract(g) else (g.nodes, g.edges)
        nodes.find(_.uniqueId == g.rootId).foreach { q =>
          q.props("durationMs") = (durationNs / 1000 / 1000).toString
          q.props("timestamp") = System.currentTimeMillis().toString
        }
        graphSink.append(nodes, edges, options)
      } catch {
        // sink failures must never fail the user's query
        case e: Throwable => logWarning(s"lineage append failed: ${e.getMessage}")
      }
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}

/** Conf-driven variant instantiable by `spark.sql.queryExecutionListeners`
  * (zero-arg constructor): reads `spark.sql.flow.sink.*` from the active
  * session at first use. */
class ConfSQLFlowListener extends QueryExecutionListener with Logging {
  private lazy val delegate: Option[SQLFlowListener] = {
    val conf = org.apache.spark.sql.SparkSession.active.conf
    val opts = Map("outputDirPath" -> conf.getOption("spark.sql.flow.sink.outputDirPath"))
      .collect { case (k, Some(v)) => k -> v }
    if (opts.contains("outputDirPath")) {
      val contracted = conf.getOption("spark.sql.flow.sink.contracted").exists(_.toBoolean)
      val sink = conf.getOption("spark.sql.flow.sink.format") match {
        case Some("cypher") => CypherFileSink()
        case _ => GraphVizSink()
      }
      Some(SQLFlowListener(sink, contracted, opts))
    } else {
      logWarning("spark.sql.flow.sink.outputDirPath not set; lineage listener inactive")
      None
    }
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    delegate.foreach(_.onSuccess(funcName, qe, durationNs))
  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}
