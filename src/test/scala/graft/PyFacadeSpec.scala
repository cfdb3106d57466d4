package org.apache.spark.api.python

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.{AdjacencyListSink, CypherFileSink, GraphVizSink, MermaidSink}

/** Scala-side coverage for the py4j façade's pure pieces (option parsing and
  * format dispatch); the pyspark round-trip itself is exercised by
  * python/tests/test_sqlflow.py (run via tools/run_python_tests.sh).
  * Reference surface: /root/reference/src/main/scala/org/apache/spark/api/
  * python/SQLFlowApi.scala:27-107. */
class PyFacadeSpec extends AnyFunSuite {

  test("parseOptions: basic, empty, malformed, value-preserving") {
    assert(SQLFlowApi.parseOptions("") === Map.empty)
    assert(SQLFlowApi.parseOptions("a=1,b=2") === Map("a" -> "1", "b" -> "2"))
    // keys are always trimmed; values are trimmed EXCEPT for sep, whose
    // whitespace is significant (`sep= => `)
    assert(SQLFlowApi.parseOptions("a=1, b=2") === Map("a" -> "1", "b" -> "2"))
    assert(SQLFlowApi.parseOptions("sep= => ") === Map("sep" -> " => "))
    assert(SQLFlowApi.parseOptions("overwrite=true , imgFormat=png ") ===
      Map("overwrite" -> "true", "imgFormat" -> "png"))
    // values may contain '=' (split at the first one only)
    assert(SQLFlowApi.parseOptions("expr=a=b") === Map("expr" -> "a=b"))
    // malformed entries are dropped, not fatal
    assert(SQLFlowApi.parseOptions("novalue,a=1") === Map("a" -> "1"))
    assert(SQLFlowApi.parseOptions("=orphan,a=1") === Map("a" -> "1"))
  }

  test("toGraphFormat dispatches case-insensitively and configures sep") {
    assert(SQLFlowApi.toGraphFormat("graphviz").isInstanceOf[GraphVizSink])
    assert(SQLFlowApi.toGraphFormat("GraphViz").isInstanceOf[GraphVizSink])
    assert(SQLFlowApi.toGraphFormat("mermaid").isInstanceOf[MermaidSink])
    assert(SQLFlowApi.toGraphFormat("cypher").isInstanceOf[CypherFileSink])
    assert(SQLFlowApi.toGraphFormat("adjacency_list") === AdjacencyListSink())
    // string-affecting option reaches the sink constructor (the round-3
    // façade dropped options on the to-string path)
    assert(SQLFlowApi.toGraphFormat("adjacency_list", Map("sep" -> ":")) ===
      AdjacencyListSink(":"))
    intercept[IllegalArgumentException](SQLFlowApi.toGraphFormat("dotviz"))
  }

  test("exportSQLFlowInto validates its arguments before touching a session") {
    // neo4jaura requires outputDirPath (reference Neo4jAuraSink contract)
    val e1 = intercept[IllegalArgumentException](
      SQLFlowApi.exportSQLFlowInto("neo4jaura", contracted = false, options = ""))
    assert(e1.getMessage.contains("outputDirPath"))
    val e2 = intercept[IllegalArgumentException](
      SQLFlowApi.exportSQLFlowInto("bolt", contracted = false, options = "outputDirPath=/tmp/x"))
    assert(e2.getMessage.contains("Unknown graph sink"))
  }
}
