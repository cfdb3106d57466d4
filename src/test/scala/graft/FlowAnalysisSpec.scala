package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft._
import org.apache.spark.sql.graft.implicits._
import org.scalatest.funsuite.AnyFunSuite

/** Lineage-engine behavioral tests, mirroring the reference's edge-set
  * testing approach (SQLFlowTestUtils.scala:43-56): node uids are normalized
  * (`_<7hex>` → `_x`) and assertions are on the edge SET, so layout and
  * optimizer noise don't matter. Contracted-mode assertions check true
  * column provenance (leaf column → query column). */
class FlowAnalysisSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
    .config("spark.ui.enabled", "false")
    .appName("flow-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def norm(id: String): String = id.replaceAll("_[0-9a-f]{7}$", "_x")

  private def edgeStrings(nodes: Seq[FlowNode], edges: Seq[FlowEdge]): Set[String] =
    edges.map(e => FlowEdge(norm(e.fromId), e.fromIdx, norm(e.toId), e.toIdx).show).toSet

  /** contracted leaf→query column pairs as (leafIdent:colName, queryColName) */
  private def provenance(df: org.apache.spark.sql.DataFrame): Set[(String, String)] = {
    val (nodes, edges) = SQLFlow.datasetGraph(df, contracted = true)
    val byId = nodes.map(n => n.uniqueId -> n).toMap
    val query = nodes.find(_.tpe == FlowNodeType.Query).get
    edges.flatMap { e =>
      for {
        from <- byId.get(e.fromId)
        i <- e.fromIdx
        j <- e.toIdx
      } yield (s"${from.ident}:${from.attributes(i)}", query.attributes(j))
    }.toSet
  }

  test("project + filter lineage: only referenced columns feed outputs") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 10)
      .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"))
    val p = provenance(df)
    assert(p.contains(("lineitem.parquet:l_orderkey", "l_orderkey")))
    assert(p.contains(("lineitem.parquet:l_extendedprice", "disc_price")))
    assert(p.contains(("lineitem.parquet:l_discount", "disc_price")))
    assert(!p.contains(("lineitem.parquet:l_extendedprice", "l_orderkey")))
    assert(!p.contains(("lineitem.parquet:l_tax", "disc_price")))
  }

  test("aggregate lineage: aggregate inputs and grouping keys map to their slots") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
    val p = provenance(df)
    assert(p.contains(("lineitem.parquet:l_returnflag", "l_returnflag")))
    assert(p.contains(("lineitem.parquet:l_quantity", "sum_qty")))
    assert(!p.contains(("lineitem.parquet:l_quantity", "l_returnflag")))
  }

  test("join lineage: both sides contribute; join keys bridge in contracted mode") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val df = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
    val p = provenance(df)
    assert(p.contains(("orders.parquet:o_orderkey", "o_orderkey")))
    assert(p.contains(("customer.parquet:c_name", "c_name")))
  }

  test("left-semi join: right-side predicate columns feed left output (provenance through predicate)") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val df = o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderpriority")
    val (nodes, edges) = SQLFlow.datasetGraph(df)
    val byId = nodes.map(n => n.uniqueId -> n).toMap
    // an edge must exist from a lineitem-side column into the join node
    val joinIds = nodes.filter(_.ident == "Join").map(_.uniqueId).toSet
    val fromLineitem = edges.exists { e =>
      byId.get(e.fromId).exists(_.ident == "lineitem.parquet") &&
        (joinIds.contains(e.toId) || byId.get(e.toId).exists(_.tpe == FlowNodeType.Plan))
    }
    assert(fromLineitem, s"expected lineitem to reach the semi-join:\n${edges.map(_.show).mkString("\n")}")
    // and contracted provenance carries it to the query output
    val p = provenance(df)
    assert(p.contains(("lineitem.parquet:l_orderkey", "o_orderkey")))
  }

  test("union lineage: each child's column i feeds output i") {
    val c = spark.read.parquet(s"$sf/customer.parquet").select(col("c_custkey").as("id"))
    val s2 = spark.read.parquet(s"$sf/supplier.parquet").select(col("s_suppkey").as("id"))
    val p = provenance(c.unionAll(s2))
    assert(p.contains(("customer.parquet:c_custkey", "id")))
    assert(p.contains(("supplier.parquet:s_suppkey", "id")))
  }

  test("generate (explode) lineage: generator input fans out to generator output") {
    val df = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("tok"))
    val p = provenance(df)
    assert(p.contains(("part.parquet:p_name", "tok")))
    assert(p.contains(("part.parquet:p_partkey", "p_partkey")))
    assert(!p.contains(("part.parquet:p_name", "p_partkey")))
  }

  test("expand (cube) lineage: grouping columns flow through the Expand transpose") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .cube("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"))
    val p = provenance(df)
    assert(p.contains(("lineitem.parquet:l_returnflag", "l_returnflag")))
    assert(p.contains(("lineitem.parquet:l_linestatus", "l_linestatus")))
    assert(p.contains(("lineitem.parquet:l_quantity", "sum_qty")))
  }

  test("window function: partition/order inputs do not pollute value column lineage") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("rn", row_number().over(w))
      .select("o_orderkey", "rn")
    val p = provenance(df)
    assert(p.contains(("orders.parquet:o_orderkey", "o_orderkey")))
  }

  test("scalar subquery in filter: subplan columns feed the compared column") {
    spark.read.parquet(s"$sf/part.parquet").createOrReplaceTempView("part_v")
    val df = spark.sql(
      "SELECT p_partkey, p_retailprice FROM part_v WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part_v)")
    val (nodes, edges) = SQLFlow.datasetGraph(df)
    // the subquery's aggregate subplan must appear and connect into the graph
    assert(nodes.count(_.ident == "part.parquet") >= 1)
    val p = provenance(df)
    assert(p.contains(("part.parquet:p_retailprice", "p_retailprice")))
  }

  test("uncontracted graph has plan nodes; contracted graph has only leaves + query") {
    val df = spark.read.parquet(s"$sf/nation.parquet")
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
    val (un, _) = SQLFlow.datasetGraph(df, contracted = false)
    assert(un.exists(_.tpe == FlowNodeType.Plan))
    val (cn, ce) = SQLFlow.datasetGraph(df, contracted = true)
    assert(cn.forall(n => n.tpe != FlowNodeType.Plan))
    assert(ce.nonEmpty)
    assert(cn.map(_.tpe).toSet === Set(FlowNodeType.Table, FlowNodeType.Query))
  }

  test("catalog mode: temp-view chains connect across view boundaries") {
    val s = spark
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("nation_base")
    spark.sql("SELECT n_regionkey, count(*) AS n FROM nation_base GROUP BY n_regionkey")
      .createOrReplaceTempView("nation_agg")
    val (nodes, edges) = SQLFlow.catalogGraph(spark)
    val idents = nodes.map(_.ident).toSet
    assert(idents.contains("nation_base"))
    assert(idents.contains("nation_agg"))
    // nation_agg's lineage must reference the nation_base VIEW node, not
    // re-expand the underlying scan
    val viewNode = nodes.find(n => n.ident == "nation_base" && n.tpe == FlowNodeType.View)
    assert(viewNode.isDefined)
    val reachesAgg = edges.exists(e => e.fromId == viewNode.get.uniqueId)
    assert(reachesAgg, edges.map(_.show).mkString("\n"))
    spark.catalog.dropTempView("nation_base")
    spark.catalog.dropTempView("nation_agg")
  }

  test("impactedBy: schema-change impact propagates THROUGH view chains, " +
      "and the column-level walk follows only the touched column") {
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("imp_src")
    spark.sql("SELECT n_regionkey, count(*) AS n FROM imp_src GROUP BY n_regionkey")
      .createOrReplaceTempView("imp_agg")
    spark.sql("SELECT n_regionkey FROM imp_agg WHERE n > 1")
      .createOrReplaceTempView("imp_top")
    spark.read.parquet(s"$sf/region.parquet").createOrReplaceTempView("imp_other")
    try {
      val all = SQLFlow.impactedBy(spark, "imp_src")
      assert(all.contains("imp_agg"), all.mkString(","))
      assert(all.contains("imp_top"), "impact must continue through imp_agg")
      assert(!all.contains("imp_other"), "unrelated view must not be impacted")
      assert(!all.contains("imp_src"), "the start node is not its own impact")
      // column-level: imp_agg consumes only n_regionkey — altering n_name
      // impacts nothing, altering n_regionkey impacts the whole chain
      val byKey = SQLFlow.impactedBy(spark, "imp_src", Some("n_regionkey"))
      assert(byKey.contains("imp_agg") && byKey.contains("imp_top"), byKey.mkString(","))
      val byName = SQLFlow.impactedBy(spark, "imp_src", Some("n_name"))
      assert(!byName.contains("imp_agg") && !byName.contains("imp_top"),
        s"n_name feeds nothing downstream, got: ${byName.mkString(",")}")
      // unknown ident / unknown column -> empty, not an error
      assert(SQLFlow.impactedBy(spark, "no_such_view").isEmpty)
      assert(SQLFlow.impactedBy(spark, "imp_src", Some("no_such_col")).isEmpty)
      // name/column resolve with the session resolver (case-insensitive
      // by default): a case-mismatched but VALID ident must not read as
      // "no downstream impact" (r10 advice — this API is schema-change
      // safety, so a silent false negative is the worst failure mode)
      assert(SQLFlow.impactedBy(spark, "IMP_SRC") === all)
      assert(SQLFlow.impactedBy(spark, "Imp_Src", Some("N_REGIONKEY")) === byKey)
    } finally {
      Seq("imp_src", "imp_agg", "imp_top", "imp_other")
        .foreach(spark.catalog.dropTempView)
    }
  }

  test("impactedBy: a diamond of views (one source, two branches, one merge) " +
      "reports each downstream node once and terminates") {
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("dia_src")
    spark.sql("SELECT n_nationkey, n_regionkey FROM dia_src WHERE n_regionkey < 3")
      .createOrReplaceTempView("dia_left")
    spark.sql("SELECT n_nationkey, n_name FROM dia_src")
      .createOrReplaceTempView("dia_right")
    spark.sql("""SELECT l.n_nationkey, r.n_name FROM dia_left l
                 JOIN dia_right r ON l.n_nationkey = r.n_nationkey""")
      .createOrReplaceTempView("dia_merge")
    try {
      val hits = SQLFlow.impactedBy(spark, "dia_src")
      // each impacted node exactly once, despite two paths into dia_merge
      assert(hits === hits.distinct, s"duplicates in ${hits.mkString(",")}")
      assert(Set("dia_left", "dia_right", "dia_merge").subsetOf(hits.toSet),
        hits.mkString(","))
      // column narrowing through the diamond: n_name flows only down the
      // right branch but still reaches the merge
      val byName = SQLFlow.impactedBy(spark, "dia_src", Some("n_name"))
      assert(byName.contains("dia_right") && byName.contains("dia_merge"),
        byName.mkString(","))
      assert(!byName.contains("dia_left"),
        s"n_name does not feed dia_left: ${byName.mkString(",")}")
    } finally {
      Seq("dia_src", "dia_left", "dia_right", "dia_merge")
        .foreach(spark.catalog.dropTempView)
    }
  }

  test("track() chains DataFrames through catalog lineage like @auto_tracking") {
    import org.apache.spark.sql.graft.implicits._
    // first stage must be non-trivial: bare scans are blacklisted from
    // subplan-to-view substitution (two views over the same scan must not
    // collapse), exactly like the reference's blacklist
    val base = spark.read.parquet(s"$sf/orders.parquet")
      .filter(org.apache.spark.sql.functions.col("o_totalprice") > 1000.0)
      .track("tracked_orders")
    base.groupBy("o_orderstatus").count().track("tracked_counts")
    val (nodes, edges) = SQLFlow.catalogGraph(spark)
    val byIdent = nodes.groupBy(_.ident)
    assert(byIdent.contains("tracked_orders") && byIdent.contains("tracked_counts"))
    val src = byIdent("tracked_orders").head.uniqueId
    assert(edges.exists(_.fromId == src), "tracked stages must connect")
    spark.catalog.dropTempView("tracked_orders")
    spark.catalog.dropTempView("tracked_counts")
  }

  test("sample/limit/tail-shaped plans flow identity lineage (default rule)") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .sample(withReplacement = false, 0.5, seed = 42)
      .select("o_orderkey", "o_totalprice")
      .limit(10)
    val (nodes, edges) = SQLFlow.datasetGraph(df)
    val table = nodes.find(_.tpe == FlowNodeType.Table).get
    val query = nodes.find(_.tpe == FlowNodeType.Query).get
    // both output columns must trace back to the scan through Sample/Limit
    def reaches(fromId: String, toId: String): Boolean = {
      val adj = edges.groupBy(_.fromId).view.mapValues(_.map(_.toId).toSet).toMap
      var seen = Set(fromId)
      var frontier = Set(fromId)
      while (frontier.nonEmpty && !seen.contains(toId)) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      seen.contains(toId)
    }
    assert(reaches(table.uniqueId, query.uniqueId))
  }

  test("sinks: dot, mermaid, adjacency list, cypher render and save; overwrite semantics") {
    val df = spark.read.parquet(s"$sf/region.parquet").select("r_name")
    val (nodes, edges) = SQLFlow.datasetGraph(df)
    val dot = GraphVizSink().toGraphString(nodes, edges)
    assert(dot.startsWith("digraph {") && dot.contains("->"))
    val mmd = MermaidSink().toGraphString(nodes, edges)
    assert(mmd.startsWith("flowchart LR") && mmd.contains("-->"))
    val adj = AdjacencyListSink().toGraphString(nodes, edges)
    assert(adj.contains(" -> "))
    val cy = CypherFileSink().toGraphString(nodes, edges)
    assert(cy.contains("MERGE (n:Node") && cy.contains("transformInto"))

    val tmp = java.nio.file.Files.createTempDirectory("flowsink").toString
    val out = s"$tmp/g1"
    df.saveAsSQLFlow(Map("outputDirPath" -> out))
    assert(new java.io.File(s"$out/sqlflow.dot").exists())
    intercept[IllegalStateException] {
      df.saveAsSQLFlow(Map("outputDirPath" -> out)) // no overwrite → error
    }
    df.saveAsSQLFlow(Map("outputDirPath" -> out, "overwrite" -> "true"))
    assert(new java.io.File(s"$out/sqlflow.dot").exists())
  }

  test("listener appends lineage per successful query") {
    val tmp = java.nio.file.Files.createTempDirectory("flowlistener").toString
    val listener = SQLFlowListener(GraphVizSink(), options = Map("outputDirPath" -> tmp))
    spark.listenerManager.register(listener)
    try {
      spark.read.parquet(s"$sf/region.parquet").groupBy("r_name").count().collect()
      // listener fires on the listener-bus thread; poll for its output
      val deadline = System.currentTimeMillis() + 15000
      def subdirsNow() = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      while (subdirsNow().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val subdirs = subdirsNow()
      assert(subdirs.nonEmpty, s"no lineage written under $tmp")
      val dots = subdirs.flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith(".dot"))
      assert(dots.nonEmpty)
    } finally {
      spark.listenerManager.unregister(listener)
    }
  }

  test("lineage graph is exposed as queryable DataFrames") {
    spark.read.parquet(s"$sf/region.parquet").createOrReplaceTempView("region_v")
    val (nodesDf, edgesDf) = SQLFlow.lineageDatasets(spark)
    assert(nodesDf.count() > 0)
    assert(edgesDf.columns.toSeq === Seq("from_id", "from_idx", "to_id", "to_idx"))
    spark.catalog.dropTempView("region_v")
  }

  test("cached plans are flagged isCached (cache-placement signal)") {
    val base = spark.read.parquet(s"$sf/region.parquet").groupBy("r_name").count()
    base.cache()
    base.count() // materialize so the optimized plan swaps in InMemoryRelation
    try {
      val df2 = base.filter(col("count") > 0)
      val (nodes, _) = SQLFlow.datasetGraph(df2)
      assert(nodes.exists(_.isCached), nodes.mkString("\n"))
    } finally base.unpersist()
  }

  test("catalog mode survives cached subplans (regression: marker rewrite must not recurse)") {
    val base = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_nationkey") >= 0).groupBy("n_regionkey").count()
    base.cache()
    base.count()
    base.createOrReplaceTempView("cached_agg_view")
    try {
      val (nodes, _) = SQLFlow.catalogGraph(spark)
      assert(nodes.exists(_.ident == "cached_agg_view"))
      assert(nodes.exists(_.isCached), nodes.mkString("\n"))
    } finally {
      base.unpersist()
      spark.catalog.dropTempView("cached_agg_view")
    }
  }

  test("differently-pruned scans of one table bind to full-schema column indices") {
    val t = spark.read.parquet(s"$sf/nation.parquet")
    val l = t.select("n_nationkey", "n_name")
    val r = t.select("n_regionkey", "n_nationkey")
    val joined = l.join(r, "n_nationkey").select("n_name", "n_regionkey")
    val (nodes, edges) = SQLFlow.datasetGraph(joined)
    val tables = nodes.filter(_.tpe == FlowNodeType.Table)
    assert(tables.size === 1, "both scans must merge into one table node")
    val attrs = tables.head.attributes
    // the merged node carries the FULL schema, and the pruned right-side
    // scan's n_regionkey must leave from n_regionkey's index — not from
    // whatever its local pruned position was
    val fromIdx = edges.filter(_.fromId == tables.head.uniqueId).flatMap(_.fromIdx).toSet
    assert(fromIdx.contains(attrs.indexOf("n_regionkey")), s"$attrs $fromIdx")
    assert(fromIdx.contains(attrs.indexOf("n_name")), s"$attrs $fromIdx")
    assert(fromIdx.subsetOf(attrs.indices.toSet))
  }

  test("same-named persistent views in different databases get distinct nodes") {
    spark.sql("CREATE DATABASE IF NOT EXISTS flowdb2")
    spark.sql(s"CREATE OR REPLACE VIEW dupname AS " +
      s"SELECT r_regionkey FROM parquet.`$sf/region.parquet`")
    spark.sql(s"CREATE OR REPLACE VIEW flowdb2.dupname AS " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet`")
    try {
      val (nodes, _) = SQLFlow.catalogGraph(spark)
      val mine = nodes.filter(n => n.ident == "dupname" || n.ident == "flowdb2.dupname")
      assert(mine.map(_.ident).toSet === Set("dupname", "flowdb2.dupname"), mine)
      // each keeps its own column list — no merged mixture
      assert(mine.find(_.ident == "dupname").get.attributes === Seq("r_regionkey"))
      assert(mine.find(_.ident == "flowdb2.dupname").get.attributes === Seq("n_nationkey", "n_name"))
    } finally {
      spark.sql("DROP VIEW IF EXISTS dupname")
      spark.sql("DROP VIEW IF EXISTS flowdb2.dupname")
      spark.sql("DROP DATABASE IF EXISTS flowdb2")
    }
  }

  test("catalog mode enumerates persistent views (re-parsed from viewText)") {
    spark.sql(s"CREATE OR REPLACE VIEW pview AS " +
      s"SELECT r_regionkey, r_name FROM parquet.`$sf/region.parquet`")
    try {
      val (nodes, edges) = SQLFlow.catalogGraph(spark)
      val v = nodes.find(n => n.ident == "pview" && n.tpe == FlowNodeType.View)
      assert(v.isDefined, nodes.mkString("\n"))
      assert(v.get.attributes === Seq("r_regionkey", "r_name"))
      // the view's columns must trace back to the parquet scan
      val scan = nodes.find(_.ident == "region.parquet")
      assert(scan.isDefined)
      assert(edges.exists(_.toId == v.get.uniqueId))
    } finally spark.sql("DROP VIEW IF EXISTS pview")
  }

  test("contracted catalog mode keeps only leaf->view column edges") {
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("cn_base")
    spark.sql("SELECT n_regionkey, count(*) AS n FROM cn_base GROUP BY n_regionkey")
      .createOrReplaceTempView("cn_agg")
    try {
      val (nodes, edges) = SQLFlow.catalogGraph(spark, contracted = true)
      assert(nodes.forall(_.tpe != FlowNodeType.Plan), nodes.mkString("\n"))
      val agg = nodes.find(_.ident == "cn_agg").get
      val base = nodes.find(_.ident == "cn_base").get
      // cn_agg's n_regionkey column comes from cn_base's n_regionkey column
      val baseIdx = base.attributes.indexOf("n_regionkey")
      val aggIdx = agg.attributes.indexOf("n_regionkey")
      assert(edges.contains(FlowEdge(base.uniqueId, Some(baseIdx), agg.uniqueId, Some(aggIdx))),
        edges.map(_.show).mkString("\n"))
    } finally {
      spark.catalog.dropTempView("cn_base")
      spark.catalog.dropTempView("cn_agg")
    }
  }

  test("global temp views appear in the catalog graph (reference gap closed)") {
    spark.read.parquet(s"$sf/region.parquet").createOrReplaceGlobalTempView("gview")
    try {
      val (nodes, _) = SQLFlow.catalogGraph(spark)
      assert(nodes.exists(n => n.ident == "global_temp.gview" && n.tpe == FlowNodeType.View),
        nodes.map(_.ident).mkString(", "))
    } finally spark.catalog.dropGlobalTempView("gview")
  }

  test("conf-driven listener activates from spark.sql.flow.sink.* settings") {
    val tmp = java.nio.file.Files.createTempDirectory("conflistener").toString
    spark.conf.set("spark.sql.flow.sink.outputDirPath", tmp)
    val listener = new ConfSQLFlowListener
    spark.listenerManager.register(listener)
    try {
      spark.read.parquet(s"$sf/nation.parquet").select("n_name").collect()
      val deadline = System.currentTimeMillis() + 15000
      def files() = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      while (files().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(files().nonEmpty, s"conf-driven listener wrote nothing under $tmp")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.unset("spark.sql.flow.sink.outputDirPath")
    }
  }

  test("conf-driven listener honors a conf set AFTER registration (late conf)") {
    val tmp = java.nio.file.Files.createTempDirectory("lateconflistener").toString
    val listener = new ConfSQLFlowListener
    spark.listenerManager.register(listener)
    try {
      def files() = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      // no conf yet: the listener must stay inactive, not latch "inactive"
      spark.read.parquet(s"$sf/region.parquet").select("r_name").collect()
      Thread.sleep(1500) // give the bus a chance to (wrongly) write
      assert(files().isEmpty, "listener wrote lineage before the conf was set")
      // conf arrives late — the next query must produce lineage
      spark.conf.set("spark.sql.flow.sink.outputDirPath", tmp)
      spark.read.parquet(s"$sf/nation.parquet").select("n_name").collect()
      val deadline = System.currentTimeMillis() + 15000
      while (files().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(files().nonEmpty, "late-set conf was ignored by the listener")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.unset("spark.sql.flow.sink.outputDirPath")
    }
  }

  test("write commands produce lineage into the target table (reference Issue #5 closed)") {
    val tmp = java.nio.file.Files.createTempDirectory("cmdlineage").toString
    val listener = SQLFlowListener(GraphVizSink(), options = Map("outputDirPath" -> tmp))
    spark.listenerManager.register(listener)
    try {
      spark.sql("DROP TABLE IF EXISTS cmd_sink")
      spark.read.parquet(s"$sf/region.parquet")
        .groupBy("r_name").count()
        .write.mode("overwrite").saveAsTable("cmd_sink")
      val deadline = System.currentTimeMillis() + 15000
      def dots() = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith(".dot"))
      while (dots().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val contents = dots().map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      assert(contents.exists(c => c.contains("cmd_sink") && c.contains("region.parquet")),
        s"no write-command lineage found in:\n${contents.mkString("\n---\n")}")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.sql("DROP TABLE IF EXISTS cmd_sink")
    }
  }

  test("exact edge set for a fixed plan (reference-style normalized compare)") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"))
    val (nodes, edges) = SQLFlow.datasetGraph(df)
    val got = edgeStrings(nodes, edges)
    val queryId = norm(nodes.find(_.tpe == FlowNodeType.Query).get.uniqueId)
    assert(got === Set(
      s""""LocalRelation_x":0 -> "Aggregate_x":0""",
      s""""Aggregate_x":0 -> "$queryId":0""",
      s""""Aggregate_x":1 -> "$queryId":1"""), got.mkString("\n"))
  }

  test("deterministic uids: same plan analyzed twice gives identical graphs") {
    val df = spark.read.parquet(s"$sf/region.parquet").select("r_name")
    val g1 = SQLFlow.datasetGraph(df)
    val g2 = SQLFlow.datasetGraph(df)
    assert(g1._1.map(_.uniqueId) === g2._1.map(_.uniqueId))
    assert(g1._2 === g2._2)
  }

  test("RDD-backed plans (localCheckpoint / createDataFrame-from-RDD) analyze as leaves") {
    // GlobalOrderOps' two-phase kernel (q95/t24) and the q81/q89
    // materialization pattern hand Catalyst a LogicalRDD leaf — the
    // lineage cut must treat it like any other typed leaf (the
    // checkpoint is a provenance BOUNDARY by design: upstream lineage is
    // captured when the upstream plan is analyzed, the checkpointed scan
    // starts a fresh segment), never throw, and keep column-level edges
    // above it
    import spark.implicits._
    val ck = Seq((1L, 10L), (2L, 20L)).toDF("id", "w").localCheckpoint()
    val df = ck.groupBy("id").agg(sum("w").as("s"))
    val (nodes, edges) = SQLFlow.datasetGraph(df)
    val leaf = nodes.find(_.tpe == FlowNodeType.LeafPlan)
    assert(leaf.nonEmpty, s"expected a LeafPlan node for the RDD scan: $nodes")
    assert(leaf.get.attributes === Seq("id", "w"))
    // aggregate edges still resolve column-level above the RDD leaf
    assert(edges.exists(e => e.fromId == leaf.get.uniqueId))
  }

  test("summarized localCheckpoint emits one checkpoint node fed by the " +
      "source plan's leaves, transitively through iterative chains") {
    // r12 verdict item 5: a bare localCheckpoint stays a blind leaf (the
    // test above), but the query-path sites use
    // CheckpointUtils.summarized, which records the source plan's LEAF
    // set — the lineage then shows which tables fed the barrier without
    // re-expanding any superseded iteration.
    import org.apache.spark.sql.graft.CheckpointUtils.SummarizedCheckpointOps
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
      .summarizedCheckpoint()
    val df = src.filter(col("n") > 0).select(col("n_regionkey"))
    val (nodes, edges) = SQLFlow.datasetGraph(df)
    val ck = nodes.filter(_.ident == "checkpoint")
    assert(ck.size == 1, s"expected one checkpoint node: ${nodes.map(_.ident)}")
    val table = nodes.find(n => n.tpe == FlowNodeType.Table && n.ident.contains("nation"))
    assert(table.nonEmpty, s"expected the nation scan to survive the barrier: $nodes")
    // node-level edge (no column claim through the truncation) table → barrier
    assert(edges.exists(e => e.fromId == table.get.uniqueId &&
      e.toId == ck.head.uniqueId && e.fromIdx.isEmpty && e.toIdx.isEmpty))
    // downstream operators still bind column-level ABOVE the barrier
    assert(edges.exists(e => e.fromId == ck.head.uniqueId && e.fromIdx.nonEmpty))
    // iterative chain: a summarized checkpoint whose source reads an
    // earlier summarized checkpoint resolves transitively — two barrier
    // nodes, still bottoming out at the real table
    val round2 = src.filter(col("n") > 1).summarizedCheckpoint()
    val (n2, _) = SQLFlow.datasetGraph(round2.select("n_regionkey"))
    assert(n2.count(_.ident == "checkpoint") == 2, n2.map(_.ident).toString)
    assert(n2.exists(n => n.tpe == FlowNodeType.Table && n.ident.contains("nation")))
    // a barrier consumed by TWO subtrees of one plan is ONE merged node
    val both = src.as("a").join(src.as("b"), "n_regionkey")
    val (n3, _) = SQLFlow.datasetGraph(both)
    assert(n3.count(_.ident == "checkpoint") == 1, n3.map(_.ident).toString)
  }

  test("GlobalOrderOps output stitches lineage through the RDD boundary " +
      "(RddLineage-registered derivation)") {
    // the two-phase prefix kernel leaves SQL for one imperative pass and
    // re-enters via createDataFrame(RDD) — an unregistered LogicalRDD
    // would truncate lineage there (the r9-r11 design-noted gap). The
    // operator registers its derivation, so the analyzer walks on through
    // the source plan: pass-through columns bind positionally, the rank
    // column derives from the order columns, each running sum from its
    // summed input plus the order columns.
    import graft.operators.GlobalOrderOps
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").as("cents"))
    val out = GlobalOrderOps.withGlobalOrder(src, Seq(col("o_orderkey")),
      rankCol = "rk", runningSums = Seq("cents" -> "cum"))
    val (nodes, _) = SQLFlow.datasetGraph(out)
    assert(nodes.exists(_.ident == "GlobalOrder"),
      s"expected a GlobalOrder boundary node: ${nodes.map(_.ident)}")
    val p = provenance(out)
    assert(p.contains(("orders.parquet:o_orderkey", "o_orderkey")))
    assert(p.contains(("orders.parquet:o_totalprice", "cents")))
    // rank ← order columns only
    assert(p.contains(("orders.parquet:o_orderkey", "rk")))
    assert(!p.contains(("orders.parquet:o_totalprice", "rk")))
    // running sum ← summed input + order columns
    assert(p.contains(("orders.parquet:o_totalprice", "cum")))
    assert(p.contains(("orders.parquet:o_orderkey", "cum")))
    // and the full q95 plan's provenance reaches the base table through
    // the boundary (it was a bare 4-node LogicalRDD-rooted graph before)
    val q95 = SparkEntry.queries("q95_pps_sample")(spark, sf)
    val p95 = provenance(q95)
    assert(p95.contains(("orders.parquet:o_totalprice", "cents")))
    assert(p95.contains(("orders.parquet:o_totalprice", "n_picks")))
  }

  test("MapInPandas lineage: opaque python-operator outputs credit child " +
      "columns positionally, extra outputs get no incoming edge") {
    // the rule (SQLFlow positional pass-through for FlatMapGroupsInPandas/
    // MapInPandas/MapInArrow) was proven only via pyspark round-trips —
    // this pins it Scala-side by constructing the plan node directly, so
    // the proof no longer depends on a Python runtime (r9 verdict item 4).
    // The rule never inspects the function expression, only the widths, so
    // a Literal stands in for the PythonUDF the analyzer would carry.
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.MapInPandas
    import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
    import org.apache.spark.sql.types.{LongType, StringType}
    val child = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name")
    val childPlan = child.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed
    val out = Seq(AttributeReference("py_key", LongType)(),
      AttributeReference("py_name", StringType)(),
      AttributeReference("py_extra", LongType)())
    val df = TestPlanBridge.dfFromPlan(spark,
      MapInPandas(Literal(1), out, childPlan, isBarrier = false, None))
    val p = provenance(df)
    assert(p.contains(("nation.parquet:n_nationkey", "py_key")))
    assert(p.contains(("nation.parquet:n_name", "py_name")))
    // positional, not name- or expression-based: no cross edges
    assert(!p.contains(("nation.parquet:n_nationkey", "py_name")))
    assert(!p.contains(("nation.parquet:n_name", "py_key")))
    // an output past the child's width is PRODUCED by the python fn —
    // no incoming leaf edge may claim it
    assert(!p.exists(_._2 == "py_extra"))
    // the rule's other two branches — MapInArrow (same 5-arg shape) and
    // FlatMapGroupsInPandas (grouping attrs + function) — share the
    // positional pass-through and must pin identically
    import org.apache.spark.sql.catalyst.plans.logical.{FlatMapGroupsInPandas, MapInArrow}
    val arrow = provenance(TestPlanBridge.dfFromPlan(spark,
      MapInArrow(Literal(1), out, childPlan, isBarrier = false, None)))
    assert(arrow.contains(("nation.parquet:n_nationkey", "py_key")))
    assert(arrow.contains(("nation.parquet:n_name", "py_name")))
    assert(!arrow.exists(_._2 == "py_extra"))
    // Unlike MapInPandas/MapInArrow above, FlatMapGroupsInPandas prunes its
    // child down to `groupingAttributes ++ functionExpr.references` — a real
    // plan's PythonUDF references the child columns it reads, so the stand-in
    // must too or ColumnPruning narrows the child to [n_nationkey] before
    // lineage runs and the positional zip credits only py_key (the r11 red
    // test: a Literal(1) stand-in has no references).
    import org.apache.spark.sql.catalyst.expressions.CreateStruct
    val grouped = provenance(TestPlanBridge.dfFromPlan(spark,
      FlatMapGroupsInPandas(Seq(childPlan.output.head),
        CreateStruct(childPlan.output),
        out.take(2), childPlan)))
    assert(grouped.contains(("nation.parquet:n_nationkey", "py_key")))
    assert(grouped.contains(("nation.parquet:n_name", "py_name")))
    assert(!grouped.contains(("nation.parquet:n_name", "py_key")))
  }

  test("Scala object-ops lineage: mapPartitions / mapGroups / " +
      "flatMapGroupsWithState produce COLUMN edges, not the node-level " +
      "fallback (r15 verdict item 5)") {
    // The typed plan stack is SerializeFromObject(op(DeserializeToObject))
    // — the rule funnels every referenced input column through the obj
    // slot, so each output column is column-reachable from each input it
    // could depend on (a typed lambda's Encoder-derived schema has no
    // sound positional correspondence, unlike the pandas ops — every
    // output honestly depends on every input).
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("nm"))
      .as[(Long, String)]

    val mp = base.mapPartitions(it => it.map { case (k, n) => (k + 1, n.length) })
      .toDF("out_k", "out_len")
    val pMp = provenance(mp)
    assert(pMp.contains(("nation.parquet:n_nationkey", "out_k")))
    assert(pMp.contains(("nation.parquet:n_name", "out_len")))
    // the funnel is honest: every output depends on every input
    assert(pMp.contains(("nation.parquet:n_name", "out_k")))

    val mg = base.groupByKey(_._1 % 5)
      .mapGroups((k, it) => (k, it.map(_._2.length).sum))
      .toDF("bucket", "total_len")
    val pMg = provenance(mg)
    assert(pMg.contains(("nation.parquet:n_nationkey", "bucket")))
    assert(pMg.contains(("nation.parquet:n_name", "total_len")))

    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val fm = base.groupByKey(_._1 % 5)
      .flatMapGroupsWithState[Long, (Long, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (k, it, _) => Iterator((k, it.length))
        }
      .toDF("bucket", "n_rows")
    val pFm = provenance(fm)
    assert(pFm.contains(("nation.parquet:n_nationkey", "bucket")))
    assert(pFm.contains(("nation.parquet:n_name", "n_rows")))
  }
}
