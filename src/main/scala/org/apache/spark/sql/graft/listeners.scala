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
        // the command's child is analyzed but not optimized — optimize with
        // the QUERY's session (SparkSession.active is a thread-local and the
        // listener bus thread would resolve the default session instead)
        val optimized = scala.util.Try(
          qe.sparkSession.sessionState.optimizer.execute(d.query)).getOrElse(d.query)
        Some((optimized, target, FlowNodeType.Table))
      case _: Command => None // other commands skipped, as the reference does
      case plan => Some((plan, s"query_${Integer.toHexString(qe.hashCode)}", FlowNodeType.Query))
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
        case e: Throwable => logWarning("lineage append failed", e)
      }
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}

/** Conf-driven variant instantiable by `spark.sql.queryExecutionListeners`
  * (zero-arg constructor): reads `spark.sql.flow.sink.*` from the active
  * session at first use. */
class ConfSQLFlowListener extends QueryExecutionListener with Logging {
  // re-resolved from the QUERY's session on EVERY event (sinks are cheap
  // case classes): a conf set after registration takes effect on the next
  // query, and later changes to format/contracted/outputDirPath are picked
  // up immediately — no memoization to go stale
  private val lastInactiveWarn = new java.util.concurrent.atomic.AtomicLong(0L)

  private def resolve(qe: QueryExecution): Option[SQLFlowListener] = {
    val conf = qe.sparkSession.conf
    conf.getOption("spark.sql.flow.sink.outputDirPath").map { dirPath =>
      val contracted = conf.getOption("spark.sql.flow.sink.contracted").exists(_.toBoolean)
      val sink = conf.getOption("spark.sql.flow.sink.format") match {
        case Some("cypher") => CypherFileSink()
        case Some("neo4j") =>
          // live-graph audit (the reference's Aura workflow) by conf alone:
          // uri defaults to a file: stream under the output dir, so the
          // same conf works with or without the optional bolt driver
          Neo4jAuraSink(
            conf.getOption("spark.sql.flow.sink.neo4j.uri")
              .getOrElse(s"file:$dirPath/sqlflow_neo4j.cypher"),
            conf.getOption("spark.sql.flow.sink.neo4j.user").getOrElse("neo4j"),
            conf.getOption("spark.sql.flow.sink.neo4j.passwd").getOrElse(""))
        case _ => GraphVizSink()
      }
      SQLFlowListener(sink, contracted, Map("outputDirPath" -> dirPath))
    }
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    resolve(qe) match {
      case Some(delegate) => delegate.onSuccess(funcName, qe, durationNs)
      case None =>
        // rate-limited to once a minute: an unset conf must not spam every
        // query in the session
        val now = System.currentTimeMillis()
        val last = lastInactiveWarn.get()
        if (now - last > 60000 && lastInactiveWarn.compareAndSet(last, now)) {
          logWarning("spark.sql.flow.sink.outputDirPath not set; lineage listener inactive")
        }
    }
  }
  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}
