package org.apache.spark.sql.graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Graph sinks (reference: basicSinks.scala, MermaidSink.scala,
  * Neo4jAuraSink.scala — re-derived, not ported).
  *
  * Common options (reference: basicSinks.scala:58-70):
  *   - `outputDirPath` (required for save)
  *   - `filenamePrefix` (default "sqlflow")
  *   - `overwrite` ("true"/"false", default false — error if dir exists)
  *   - `sep` for the adjacency list (default " -> ")
  */
private[graft] object SinkIO {
  def prepareDir(options: Map[String, String]): File = {
    val dirPath = options.getOrElse("outputDirPath",
      throw new IllegalArgumentException("`outputDirPath` option is required"))
    val overwrite = options.get("overwrite").exists(_.toBoolean)
    val dir = new File(dirPath)
    if (dir.exists() && !overwrite) {
      throw new IllegalStateException(
        s"output dir $dirPath already exists (pass overwrite=true to replace)")
    }
    if (dir.exists()) { // delete-then-mkdir (reference: basicSinks.scala:34-49)
      def rm(f: File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        if (!f.delete() && f.exists()) {
          throw new java.io.IOException(s"could not clear output dir entry $f")
        }
      }
      rm(dir)
    }
    dir.mkdirs()
    dir
  }

  def writeFile(dir: File, name: String, content: String): File = {
    val f = new File(dir, name)
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    f
  }

  def timestampDirName(): String =
    LocalDateTime.now().format(DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS"))

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")
}

/** Graphviz dot sink: each node is rendered as an HTML-ish table whose rows
  * are columns; edges target row ports so column-level lineage is visible.
  * Cached nodes are light blue (reference: basicSinks.scala:87-212). */
case class GraphVizSink() extends FlowBatchSink with FlowStreamSink with FlowFormat {
  import SinkIO._

  override def toGraphString(nodes: Seq[FlowNode], edges: Seq[FlowEdge]): String = {
    val nodeStrs = nodes.map { n =>
      val color = if (n.isCached) "lightblue" else
        (n.tpe match {
          case FlowNodeType.Table => "black"
          case FlowNodeType.View => "blue"
          case FlowNodeType.Query => "lightgray"
          case _ => "lightgray"
        })
      val rows = n.attributes.zipWithIndex.map { case (a, i) =>
        s"""<tr><td port="$i">${escape(a)}</td></tr>"""
      }.mkString("\n")
      s""""${n.uniqueId}" [color="$color" label=<
         |<table>
         |  <tr><td bgcolor="$color"><i>${escape(n.ident)}</i></td></tr>
         |$rows
         |</table>>];""".stripMargin
    }
    val edgeStrs = edges.map { e =>
      val from = e.fromIdx.map(i => s""""${e.fromId}":$i""").getOrElse(s""""${e.fromId}"""")
      val to = e.toIdx.map(i => s""""${e.toId}":$i""").getOrElse(s""""${e.toId}"""")
      s"$from -> $to;"
    }
    s"""digraph {
       |  graph [pad="0.5" nodesep="0.5" ranksep="1" fontname="Helvetica" rankdir=LR];
       |  node [shape=plaintext]
       |
       |${nodeStrs.mkString("\n")}
       |${edgeStrs.mkString("\n")}
       |}
       |""".stripMargin
  }

  override def write(nodes: Seq[FlowNode], edges: Seq[FlowEdge],
      options: Map[String, String]): Unit = {
    val dir = prepareDir(options)
    val prefix = options.getOrElse("filenamePrefix", "sqlflow")
    val dot = writeFile(dir, s"$prefix.dot", toGraphString(nodes, edges))
    // optional image rendering via the external `dot` binary (reference:
    // basicSinks.scala:169-176); silently degrades to .dot-only when the
    // binary is not installed
    options.get("imgFormat").foreach { fmt =>
      try {
        val out = new File(dir, s"$prefix.$fmt")
        val p = new ProcessBuilder("dot", s"-T$fmt", dot.getAbsolutePath,
          "-o", out.getAbsolutePath)
          .redirectErrorStream(true)
          // discard the merged output: an undrained pipe blocks `dot` once
          // the OS buffer fills on warning-heavy renders
          .redirectOutput(ProcessBuilder.Redirect.DISCARD)
          .start()
        if (!p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)) {
          p.destroyForcibly()
          System.err.println(s"[sqlflow] `dot -T$fmt` timed out; wrote ${dot.getPath} only")
        } else if (p.exitValue() != 0) {
          System.err.println(s"[sqlflow] `dot -T$fmt` exited ${p.exitValue()}; wrote ${dot.getPath} only")
        }
      } catch {
        case _: java.io.IOException =>
          System.err.println(s"[sqlflow] graphviz `dot` not available; wrote ${dot.getPath} only")
      }
    }
  }

  /** Listener mode: fresh timestamped subdir per query
    * (reference: basicSinks.scala:193-211). */
  override def append(nodes: Seq[FlowNode], edges: Seq[FlowEdge],
      options: Map[String, String]): Unit = {
    val base = options.getOrElse("outputDirPath",
      throw new IllegalArgumentException("`outputDirPath` option is required"))
    // uniquified: two queries finishing in the same millisecond must not
    // overwrite each other's lineage
    var dir = new File(base, timestampDirName())
    var seq = 0
    while (!dir.mkdirs() && seq < 10000) {
      seq += 1
      dir = new File(base, s"${timestampDirName()}-$seq")
    }
    val prefix = options.getOrElse("filenamePrefix", "sqlflow")
    writeFile(dir, s"$prefix.dot", toGraphString(nodes, edges))
  }
}

/** Mermaid flowchart sink (reference: MermaidSink.scala). */
case class MermaidSink() extends FlowBatchSink with FlowFormat {
  import SinkIO._

  override def toGraphString(nodes: Seq[FlowNode], edges: Seq[FlowEdge]): String = {
    // index suffix keeps sanitized ids collision-free ("x_a.b" and "x.a_b"
    // would otherwise both sanitize to "x_a_b" and merge in the chart)
    val midMap: Map[String, String] = nodes.map(_.uniqueId).distinct.zipWithIndex.map {
      case (id, i) => id -> s"${id.replaceAll("[^A-Za-z0-9_]", "_")}_$i"
    }.toMap
    def mid(id: String): String = midMap.getOrElse(id, id.replaceAll("[^A-Za-z0-9_]", "_"))
    val nodeStrs = nodes.map { n =>
      val cols = n.attributes.map(escape).mkString("<br/>")
      val label = s"<b>${escape(n.ident)}</b>${if (cols.nonEmpty) "<br/>" + cols else ""}"
      s"""  ${mid(n.uniqueId)}["$label"]"""
    }
    val edgeStrs = edges.map { e =>
      val lab = (e.fromIdx, e.toIdx) match {
        case (Some(i), Some(j)) => s"|$i->$j|"
        case _ => ""
      }
      s"  ${mid(e.fromId)} -->$lab ${mid(e.toId)}"
    }.distinct
    ("flowchart LR" +: (nodeStrs ++ edgeStrs)).mkString("\n") + "\n"
  }

  override def write(nodes: Seq[FlowNode], edges: Seq[FlowEdge],
      options: Map[String, String]): Unit = {
    val dir = prepareDir(options)
    val prefix = options.getOrElse("filenamePrefix", "sqlflow")
    writeFile(dir, s"$prefix.mmd", toGraphString(nodes, edges))
  }
}

/** Adjacency-list sink (reference: basicSinks.scala:214-231). */
case class AdjacencyListSink(sep: String = " -> ") extends FlowBatchSink with FlowFormat {
  import SinkIO._

  override def toGraphString(nodes: Seq[FlowNode], edges: Seq[FlowEdge]): String = {
    val byFrom = edges.groupBy(_.fromId)
    nodes.flatMap { n =>
      byFrom.get(n.uniqueId).map { es =>
        val dsts = es.map(_.toId).distinct.mkString(",")
        s"${n.uniqueId}$sep$dsts"
      }
    }.mkString("\n") + "\n"
  }

  override def write(nodes: Seq[FlowNode], edges: Seq[FlowEdge],
      options: Map[String, String]): Unit = {
    val dir = prepareDir(options)
    val prefix = options.getOrElse("filenamePrefix", "sqlflow")
    val s = options.getOrElse("sep", sep)
    writeFile(dir, s"$prefix.lst", copy(sep = s).toGraphString(nodes, edges))
  }
}

/** Cypher-statement sink: emits the same MERGE/CONSTRAINT statement stream
  * the reference sends to Neo4j Aura (Neo4jAuraSink.scala:124-214), written
  * to a .cypher file instead of a bolt connection — this container has no
  * network egress. Point any Neo4j at the file to load the graph. */
case class CypherFileSink() extends FlowBatchSink with FlowStreamSink with FlowFormat {
  import SinkIO._

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")

  override def toGraphString(nodes: Seq[FlowNode], edges: Seq[FlowEdge]): String = {
    val constraints = Seq(
      "CREATE CONSTRAINT unique_node_uid IF NOT EXISTS FOR (n:Node) REQUIRE n.uid IS UNIQUE;")
    val nodeStmts = nodes.map { n =>
      val label = n.tpe match {
        case FlowNodeType.Table => "Table"
        case FlowNodeType.View => "View"
        case FlowNodeType.Query => "Query"
        case _ => "Plan"
      }
      s"MERGE (n:Node {uid: '${esc(n.uniqueId)}'}) " +
        s"SET n:$label, n.ident = '${esc(n.ident)}', n.cached = ${n.isCached}, " +
        s"n.schema = '${esc(n.schemaDDL)}';"
    }
    val edgeStmts = edges.map { e =>
      val props = Seq(
        e.fromIdx.map(i => s"fromIdx: $i"),
        e.toIdx.map(i => s"toIdx: $i")).flatten.mkString(", ")
      s"MATCH (a:Node {uid: '${esc(e.fromId)}'}), (b:Node {uid: '${esc(e.toId)}'}) " +
        s"MERGE (a)-[:transformInto {$props}]->(b);"
    }
    (constraints ++ nodeStmts ++ edgeStmts).mkString("\n") + "\n"
  }

  override def write(nodes: Seq[FlowNode], edges: Seq[FlowEdge],
      options: Map[String, String]): Unit = {
    val dir = prepareDir(options)
    val prefix = options.getOrElse("filenamePrefix", "sqlflow")
    writeFile(dir, s"$prefix.cypher", toGraphString(nodes, edges))
  }

  override def append(nodes: Seq[FlowNode], edges: Seq[FlowEdge],
      options: Map[String, String]): Unit = {
    val base = options.getOrElse("outputDirPath",
      throw new IllegalArgumentException("`outputDirPath` option is required"))
    val dir = new File(base)
    dir.mkdirs()
    val prefix = options.getOrElse("filenamePrefix", "sqlflow")
    val f = Paths.get(dir.toString, s"${prefix}_append.cypher")
    Files.write(f, toGraphString(nodes, edges).getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
