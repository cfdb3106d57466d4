package graft

import java.nio.file.Files

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.{CypherTransport, FlowEdge, FlowNode, FlowNodeType, Neo4jAuraSink}

/** Transport semantics of the Neo4j Aura sink (reference
  * Neo4jAuraSink.scala:118-240): constraints first in their own
  * transaction, idempotent MERGE batches bounded by batchSize, the same
  * delivery for batch and listener modes, a file: transport that emits a
  * loadable statement stream, and a clear failure when the optional bolt
  * driver is absent. */
class Neo4jSinkSpec extends AnyFunSuite {

  private def node(id: String, tpe: FlowNodeType) =
    FlowNode(id, id, Seq("c0"), "c0 INT", tpe)

  private val nodes = Seq(
    node("t1", FlowNodeType.Table),
    node("Project_1", FlowNodeType.Plan),
    node("query_1", FlowNodeType.Query))
  private val edges = Seq(
    FlowEdge("t1", Some(0), "Project_1", Some(0)),
    FlowEdge("Project_1", Some(0), "query_1", Some(0)))

  /** Records every transaction the sink runs, in order. */
  private class Recording(sink: Neo4jAuraSink, reuse: Boolean = false) {
    val batches: mutable.ArrayBuffer[Seq[String]] = mutable.ArrayBuffer.empty
    var opened = 0
    var closed = 0
    val wrapped: Neo4jAuraSink =
      new Neo4jAuraSink(sink.uri, sink.user, sink.passwd, reuseTransport = reuse) {
        override protected def openTransport(): CypherTransport = {
          opened += 1
          new CypherTransport {
            override def runBatch(statements: Seq[String]): Unit = batches += statements
            override def close(): Unit = closed += 1
          }
        }
      }
  }

  test("constraints ship first in their own transaction; merges batch by batchSize") {
    val rec = new Recording(Neo4jAuraSink("neo4j://example", "u", "p"))
    rec.wrapped.write(nodes, edges, Map.empty)
    assert(rec.batches.nonEmpty)
    assert(rec.batches.head.forall(_.startsWith("CREATE CONSTRAINT")),
      "first transaction must carry only the uniqueness constraints")
    val mergeBatches = rec.batches.tail
    assert(mergeBatches.flatten.forall(_.contains("MERGE")))
    assert(mergeBatches.forall(_.size <= rec.wrapped.batchSize))
    // 3 node + 2 edge MERGEs for this graph
    assert(mergeBatches.flatten.size === 5)
    assert(rec.closed === 1, "transport must be closed exactly once per delivery")
  }

  test("a graph larger than batchSize splits into multiple transactions") {
    val rec = new Recording(Neo4jAuraSink("neo4j://example", "u", "p"))
    val many = (1 to (rec.wrapped.batchSize + 10)).map(i => node(s"t$i", FlowNodeType.Table))
    rec.wrapped.write(many, Seq.empty, Map.empty)
    val mergeBatches = rec.batches.tail
    assert(mergeBatches.size === 2)
    assert(mergeBatches.head.size === rec.wrapped.batchSize)
    assert(mergeBatches.last.size === 10)
  }

  test("append (listener mode) delivers the same statement stream as write") {
    val w = new Recording(Neo4jAuraSink("neo4j://example", "u", "p"))
    val a = new Recording(Neo4jAuraSink("neo4j://example", "u", "p"))
    w.wrapped.write(nodes, edges, Map.empty)
    a.wrapped.append(nodes, edges, Map.empty)
    assert(w.batches.toSeq === a.batches.toSeq)
  }

  test("file: URI emits a cypher-shell-loadable transaction stream") {
    val dir = Files.createTempDirectory("neo4j_file_transport")
    val path = dir.resolve("stream.cypher")
    val sink = Neo4jAuraSink(s"file:$path", "u", "p")
    sink.write(nodes, edges, Map.empty)
    sink.append(nodes, edges, Map.empty) // idempotent re-load, same file
    val body = new String(Files.readAllBytes(path))
    assert(body.contains(":begin") && body.contains(":commit"))
    // balanced transaction markers, constraints present, MERGEs idempotent
    assert(body.linesIterator.count(_ == ":begin") ===
      body.linesIterator.count(_ == ":commit"))
    assert(body.contains("CREATE CONSTRAINT unique_table_node_uid IF NOT EXISTS"))
    val merges = body.linesIterator.filter(_.startsWith("MERGE (n:Node")).toSeq
    assert(merges.size === 6, "two deliveries x three nodes")
    assert(merges.distinct.size === 3, "re-delivery must repeat identical MERGEs")
  }

  test("reuseTransport pins one connection for the sink's lifetime: " +
      "constraints once, transport closed only by close()") {
    val rec = new Recording(Neo4jAuraSink("neo4j://example", "u", "p"), reuse = true)
    rec.wrapped.append(nodes, edges, Map.empty)
    rec.wrapped.append(nodes, edges, Map.empty)
    assert(rec.opened === 1, "second append must reuse the pinned transport")
    assert(rec.closed === 0, "pinned transport must outlive individual deliveries")
    val constraintBatches =
      rec.batches.count(_.forall(_.startsWith("CREATE CONSTRAINT")))
    assert(constraintBatches === 1, "constraints go once per connection, not per delivery")
    rec.wrapped.close()
    assert(rec.closed === 1)
    // after close() the sink reconnects (and re-sends constraints) cleanly
    rec.wrapped.append(nodes, edges, Map.empty)
    assert(rec.opened === 2)
    assert(rec.batches.count(_.forall(_.startsWith("CREATE CONSTRAINT"))) === 2)
  }

  test("reuseTransport drops the pinned transport after a failed delivery: " +
      "the next delivery reconnects and re-sends constraints") {
    var failNextMerge = true
    val batches = mutable.ArrayBuffer.empty[Seq[String]]
    var opened = 0
    var closed = 0
    val sink = new Neo4jAuraSink("neo4j://example", "u", "p", reuseTransport = true) {
      override protected def openTransport(): CypherTransport = {
        opened += 1
        new CypherTransport {
          override def runBatch(statements: Seq[String]): Unit = {
            if (failNextMerge && statements.exists(_.contains("MERGE"))) {
              failNextMerge = false
              throw new RuntimeException("connection reset by peer")
            }
            batches += statements
          }
          override def close(): Unit = closed += 1
        }
      }
    }
    intercept[RuntimeException] { sink.append(nodes, edges, Map.empty) }
    assert(closed === 1,
      "a pinned transport that failed a delivery must be closed, not cached dead")
    sink.append(nodes, edges, Map.empty)
    assert(opened === 2, "the delivery after a failure must open a fresh transport")
    assert(batches.count(_.forall(_.startsWith("CREATE CONSTRAINT"))) === 2,
      "constraints must be re-sent on the replacement connection")
    assert(batches.flatten.count(_.contains("MERGE")) === 5,
      "the post-failure delivery must land its full statement stream")
    sink.close()
    assert(closed === 2)
  }

  test("batch write honors the reference's empty-database contract: " +
      "non-empty target rejects unless overwrite, overwrite resets first") {
    val dir = Files.createTempDirectory("neo4j_overwrite_contract")
    val path = dir.resolve("stream.cypher")
    val sink = Neo4jAuraSink(s"file:$path", "u", "p")
    sink.write(nodes, edges, Map.empty) // empty target: plain write is fine
    val e = intercept[IllegalStateException] {
      sink.write(nodes, edges, Map.empty) // target now non-empty
    }
    assert(e.getMessage.contains("Database should be empty"), e.getMessage)
    // overwrite: the reset statement must land BEFORE the new graph
    sink.write(nodes, edges, Map("overwrite" -> "true"))
    val stmts = new String(Files.readAllBytes(path)).linesIterator
      .filterNot(l => l == ":begin" || l == ":commit").toSeq
    val resetAt = stmts.indexWhere(_.contains("DETACH DELETE"))
    assert(resetAt >= 0, "overwrite must send the reset statement")
    assert(!stmts.take(resetAt).exists(_.startsWith("MERGE")) ||
      stmts.drop(resetAt + 1).exists(_.startsWith("MERGE")),
      "the reset must precede the re-delivered graph")
    // append mode never checks emptiness (reference parity)
    sink.append(nodes, edges, Map.empty)
  }

  test("bolt transport fails with a clear message when the driver jar is absent") {
    val sink = Neo4jAuraSink("neo4j+s://demo.databases.neo4j.io", "u", "p")
    val e = intercept[IllegalStateException] {
      sink.write(nodes, edges, Map.empty)
    }
    assert(e.getMessage.contains("neo4j-java-driver not on the classpath"))
    assert(e.getMessage.contains("file:"))
  }

  test("conf-driven listener streams per-query lineage through the neo4j sink") {
    // format=neo4j with the default file: transport — the full continuous-
    // audit loop (query → listener → Aura-shaped statement stream) wired by
    // session conf alone, no code
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("neo4j-sink-spec")
      .getOrCreate()
    val tmp = Files.createTempDirectory("neo4j_conf_listener").toString
    spark.conf.set("spark.sql.flow.sink.outputDirPath", tmp)
    spark.conf.set("spark.sql.flow.sink.format", "neo4j")
    val listener = new org.apache.spark.sql.graft.ConfSQLFlowListener
    spark.listenerManager.register(listener)
    try {
      spark.range(10).selectExpr("id % 3 AS k").groupBy("k").count().collect()
      val stream = new java.io.File(tmp, "sqlflow_neo4j.cypher")
      val deadline = System.currentTimeMillis() + 15000
      while (!stream.isFile && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(stream.isFile, s"listener wrote no neo4j statement stream under $tmp")
      val body = new String(Files.readAllBytes(stream.toPath))
      assert(body.contains(":begin") && body.contains("MERGE (n:Node"))
      assert(body.contains("transformInto"))
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.unset("spark.sql.flow.sink.outputDirPath")
      spark.conf.unset("spark.sql.flow.sink.format")
    }
  }
}
