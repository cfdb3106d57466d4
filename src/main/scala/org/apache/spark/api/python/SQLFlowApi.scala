package org.apache.spark.api.python

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.{AdjacencyListSink, CypherFileSink, FlowBatchSink, FlowFormat, GraphVizSink, MermaidSink, SQLFlow}

/** py4j-facing façade (reference: /root/reference/src/main/scala/org/apache/
  * spark/api/python/SQLFlowApi.scala:27-107). Lives in
  * `org.apache.spark.api.python` because PySpark's gateway java-imports that
  * package wholesale, so `sc._jvm.SQLFlowApi` resolves without a qualified
  * path; `python/sqlflow.py` is the matching Python front-end.
  *
  * Options cross the process boundary as a single `k1=v1,k2=v2` string (py4j
  * maps are awkward from Python); values may contain `=` (split at the first
  * one only).
  */
object SQLFlowApi {

  private[python] def parseOptions(options: String): Map[String, String] =
    options.split(",").filter(_.trim.nonEmpty).flatMap { kv =>
      // `sep` values are whitespace-significant (`sep= => `); every other
      // value is trimmed — "overwrite=true " must parse as a boolean and
      // "imgFormat=png " must not name the rendered file "sqlflow.png "
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty =>
          val key = k.trim
          Some(key -> (if (key == "sep") v else v.trim))
        case _ =>
          System.err.println(s"[sqlflow] ignoring malformed option entry: $kv")
          None
      }
    }.toMap

  /** Format dispatch. String-affecting options (today just `sep` for the
    * adjacency list) configure the sink here so `toSQLFlowString` honors
    * them; IO options (outputDirPath/overwrite/...) are consumed by
    * `write()` instead. */
  private[python] def toGraphFormat(
      fmt: String,
      options: Map[String, String] = Map.empty): FlowBatchSink with FlowFormat =
    fmt.toLowerCase(Locale.ROOT) match {
      case "graphviz" => GraphVizSink()
      case "adjacency_list" =>
        options.get("sep").map(AdjacencyListSink(_)).getOrElse(AdjacencyListSink())
      case "mermaid" => MermaidSink()
      case "cypher" => CypherFileSink()
      case other => throw new IllegalArgumentException(s"Unknown graph format: $other")
    }

  private def activeSession: SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "no active SparkSession — create one before calling SQLFlowApi"))

  def debugPrintAsSQLFlow(
      contracted: Boolean,
      graphFormat: String = "graphviz",
      options: String = ""): Unit = {
    // scalastyle:off println
    println(toSQLFlowString(contracted, graphFormat, options))
    // scalastyle:on println
  }

  def toSQLFlowString(
      contracted: Boolean,
      graphFormat: String = "graphviz",
      options: String = ""): String =
    SQLFlow.printAsSQLFlow(activeSession, contracted,
      toGraphFormat(graphFormat, parseOptions(options)))

  def saveAsSQLFlow(
      graphFormat: String = "graphviz",
      contracted: Boolean,
      options: String): Unit = {
    val parsed = parseOptions(options)
    SQLFlow.saveAsSQLFlow(activeSession, parsed, contracted,
      toGraphFormat(graphFormat, parsed))
  }

  /** Impact analysis over the catalog graph (see SQLFlow.impactedBy):
    * affected view / query / write-target idents, sorted. `column` empty
    * means node-level. Returns a java.util.List for py4j round-tripping. */
  def impactedBy(name: String, column: String = "",
      contracted: Boolean = false): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    val col = Option(column).map(_.trim).filter(_.nonEmpty)
    SQLFlow.impactedBy(activeSession, name, col, contracted).asJava
  }

  /** Reference parity for `exportSQLFlowInto("neo4jaura", ...)`: this build
    * has no network egress, so the Neo4j-shaped export emits the equivalent
    * Cypher statement stream (constraints + MERGEs) to a file instead of a
    * bolt session — same graph, loadable offline. Requires `outputDirPath`.
    */
  def exportSQLFlowInto(graphSink: String, contracted: Boolean, options: String): Unit = {
    val parsed = parseOptions(options)
    graphSink.toLowerCase(Locale.ROOT) match {
      case "neo4jaura" | "cypher" =>
        if (!parsed.contains("outputDirPath")) {
          throw new IllegalArgumentException(
            s"`outputDirPath` must be specified in the graph sink '$graphSink'")
        }
        SQLFlow.saveAsSQLFlow(activeSession, parsed, contracted, CypherFileSink())
      case other => throw new IllegalArgumentException(s"Unknown graph sink: $other")
    }
  }
}
