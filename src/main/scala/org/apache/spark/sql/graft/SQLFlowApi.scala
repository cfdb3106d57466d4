package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{SparkSession => ClassicSession, Dataset => ClassicDataset}

/** Public lineage API — same surface as the reference
  * (SQLFlow.scala:946-966, 856-881): save/print for a whole catalog or a
  * single Dataset, plain or contracted, through a pluggable sink.
  *
  * Additions over the reference: deterministic uids, and
  * [[SQLFlow.lineageDatasets]] exposing the graph as two DataFrames so
  * lineage itself is SQL-queryable (useful at fleet scale: one lineage graph
  * per day of queries is just another table to join).
  */
object SQLFlow {

  /** Lineage graph of a single Dataset's optimized plan. */
  def datasetGraph(ds: Dataset[_], contracted: Boolean = false)
      : (Seq[FlowNode], Seq[FlowEdge]) = {
    val cds = ds.asInstanceOf[ClassicDataset[_]]
    val session = cds.sparkSession
    val plan = cds.queryExecution.optimizedPlan
    val rootName = s"query_${math.abs(plan.semanticHash()).toString}"
    val g = FlowAnalysis.analyze(plan, rootName, FlowNodeType.Query, isCachedFn(session))
    if (contracted) FlowAnalysis.contract(g) else (g.nodes, g.edges)
  }

  /** Lineage graph of every (temp) view in the session catalog
    * (reference EP1: SQLFlow.scala:61-189). View-on-view references are cut
    * at view boundaries via [[ViewRef]] substitution by semantic hash. */
  def catalogGraph(spark: SparkSession, contracted: Boolean = false)
      : (Seq[FlowNode], Seq[FlowEdge]) = {
    val session = spark.asInstanceOf[ClassicSession]
    val catalog = session.sessionState.catalog

    // 1. gather analyzed plans: persistent views (re-parsed from viewText)
    //    and temp views (pre-analyzed)
    val currentDb = catalog.getCurrentDatabase
    val persistent = for {
      db <- catalog.listDatabases()
      ident <- catalog.listTables(db)
      meta <- scala.util.Try(catalog.getTableMetadata(ident)).toOption.toSeq
      text <- meta.viewText.toSeq
      plan <- scala.util.Try {
        val parsed = session.sessionState.sqlParser.parsePlan(text)
        // resolve in the view's OWN database: unqualified table references
        // in the stored text mean that namespace, not the session's current
        val prev = catalog.getCurrentDatabase
        try {
          catalog.setCurrentDatabase(db)
          session.sessionState.executePlan(parsed).analyzed
        } finally catalog.setCurrentDatabase(prev)
      }.toOption.toSeq
      // qualify views outside the current database so same-named views in
      // different databases get distinct node uids
    } yield (if (db == currentDb) ident.table else s"$db.${ident.table}", plan)

    // SQL-created temp views store the PARSED plan (viewText is re-resolved
    // on access since Spark 3.1); DataFrame-created ones store analyzed
    // plans — normalize by analyzing when unresolved
    def analyzed(p: LogicalPlan): Option[LogicalPlan] =
      if (p.resolved) Some(p)
      else scala.util.Try(session.sessionState.executePlan(p).analyzed).toOption

    // SORTED: getTempViewNames() iterates the catalog's hash map, whose
    // order depends on its insertion/rehash HISTORY (views created earlier
    // in the session shift it even after being dropped) — and the shared
    // uid counter below assigns node ids in `all` order, so without the
    // sort the same catalog content could print different uids depending
    // on what the session did before (r16: surfaced as golden drift when
    // two new corpus files ran ahead of existing ones)
    val temps = catalog.getTempViewNames().sorted.flatMap { name =>
      catalog.getTempView(name).flatMap(v => analyzed(v.child)).map(name -> _)
    }
    // global temp views too (the reference does NOT support these —
    // README.md:273); named with their database prefix
    val globalDb = session.sessionState.conf.getConfString(
      "spark.sql.globalTempDatabase", "global_temp")
    // sorted for the same reason as temps above: listViewNames iterates the
    // global manager's hash map, so unsorted order is session-history-
    // dependent and would drift the shared-counter uids (r16 advice)
    val globals = catalog.globalTempViewManager.listViewNames("*").sorted.flatMap { name =>
      catalog.getGlobalTempView(name).flatMap(v => analyzed(v.child)).map(s"$globalDb.$name" -> _)
    }
    val all: Seq[(String, LogicalPlan)] = persistent ++ temps ++ globals

    // 2. semanticHash → view name, for subplan-to-view substitution
    //    (reference: SQLFlow.scala:94-96,150-154); sorted for determinism
    val hashToView: Map[Int, String] =
      all.sortBy(_._1).map { case (n, p) => p.semanticHash() -> n }.toMap

    // trivial subplans (bare scans / alias-only wrappers) are excluded from
    // substitution — two views that are both just "scan t" must not collapse
    // into each other (reference blacklist: SQLFlow.scala:103-107)
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Project, SubqueryAlias}
    def trivial(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case SubqueryAlias(_, c) => trivial(c)
      case Project(ps, c) if ps.forall(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Attribute]) => trivial(c)
      case _ => false
    }

    val viewNames = all.map(_._1).toSet
    val counter = new FlowAnalysis.Counter
    val cachedFn = isCachedFn(session)
    val graphs = all.map { case (name, analyzed) =>
      // cut at OTHER views' boundaries — BY NAME for explicit view
      // references (SubqueryAlias/View wrappers in analyzed plans), by
      // semantic hash only as the DataFrame-chain fallback (reference:
      // SQLFlow.scala:133-154) — then wrap cached subtrees and optimize
      import org.apache.spark.sql.catalyst.plans.logical.View
      val substituted = analyzed.transformDown {
        case s @ SubqueryAlias(ident, _)
            if viewNames.contains(ident.name) && ident.name != name =>
          ViewRef(ident.name, s.output, isTemp = true)
        case v: View
            if viewNames.contains(v.desc.identifier.table) && v.desc.identifier.table != name =>
          ViewRef(v.desc.identifier.table, v.output, isTemp = v.isTempView)
        case p if !trivial(p) && hashToView.get(p.semanticHash()).exists(_ != name) =>
          ViewRef(hashToView(p.semanticHash()), p.output, isTemp = true)
      }
      // cached-subtree wrap as a MANUAL one-shot recursion: a transformDown
      // rule returning CachedMarker(p) would re-match its own child p and
      // recurse forever (the lookup is checked on the pre-wrap plan)
      def markCached(p: LogicalPlan): LogicalPlan = {
        val isC = !p.isInstanceOf[ViewRef] && cachedFn(p)
        val mapped = p.mapChildren(markCached)
        if (isC) CachedMarker(mapped) else mapped
      }
      val optimized = session.sessionState.optimizer.execute(markCached(substituted))
      val g = FlowAnalysis.analyze(optimized, name, FlowNodeType.View, cachedFn, counter)
      if (contracted) { val (n, e) = FlowAnalysis.contract(g); FlowAnalysis.Graph(n, e, g.rootId, Nil) }
      else g
    }
    merge(graphs.map(g => (g.nodes, g.edges)))
  }

  /** Merge per-view graphs: nodes dedupe by uid (cached flag ORed). */
  def merge(parts: Seq[(Seq[FlowNode], Seq[FlowEdge])]): (Seq[FlowNode], Seq[FlowEdge]) = {
    val byId = mutable.LinkedHashMap[String, FlowNode]()
    parts.flatMap(_._1).foreach { n =>
      byId.get(n.uniqueId) match {
        case Some(prev) => if (n.isCached && !prev.isCached) byId(n.uniqueId) = prev.copy(isCached = true)
        case None => byId(n.uniqueId) = n
      }
    }
    val edges = mutable.LinkedHashSet[FlowEdge]()
    parts.flatMap(_._2).foreach(edges += _)
    (byId.values.toSeq, edges.toSeq)
  }

  private def isCachedFn(session: ClassicSession): LogicalPlan => Boolean = { plan =>
    scala.util.Try(
      session.sharedState.cacheManager.lookupCachedData(session, plan).isDefined
    ).getOrElse(false)
  }

  // -------------------------------------------------------------------
  // Reference-parity convenience surface (SQLFlow.scala:946-966)
  // -------------------------------------------------------------------

  def saveAsSQLFlow(
      spark: SparkSession,
      options: Map[String, String] = Map.empty,
      contracted: Boolean = false,
      graphSink: FlowBatchSink = GraphVizSink()): Unit = {
    val (nodes, edges) = catalogGraph(spark, contracted)
    graphSink.write(nodes, edges, options)
  }

  def printAsSQLFlow(
      spark: SparkSession,
      contracted: Boolean = false,
      graphFormat: FlowFormat = GraphVizSink()): String = {
    val (nodes, edges) = catalogGraph(spark, contracted)
    graphFormat.toGraphString(nodes, edges)
  }

  /** Impact analysis over the catalog-wide flow graph — the question a
    * schema-change review asks before altering `name` (a table or view
    * ident): which views / tracked queries / write targets transitively
    * consume it? Pass `column` to narrow the walk to one source column:
    * the walk then follows only edges leaving that column's slot (plus
    * node-level edges, which make no column claim and must stay
    * conservative), through intermediate plan nodes' per-column slots.
    * Unlike the cypher sink's dst walk, impact propagates THROUGH views —
    * a view over a view over the table is impacted too. Returns affected
    * node idents, distinct and sorted; same 128-depth guard as every
    * other traversal (reference SQLFlow.scala:804-822). Name and column
    * match with the session resolver (case-insensitive by default), so
    * only a genuinely unknown ident returns the empty list. */
  def impactedBy(spark: SparkSession, name: String, column: Option[String] = None,
      contracted: Boolean = false): Seq[String] = {
    val (nodes, edges) = catalogGraph(spark, contracted)
    val nodeById = nodes.map(n => n.uniqueId -> n).toMap
    // resolve name/column with the session's resolver (case-insensitive
    // unless spark.sql.caseSensitive): a case-mismatched but valid ident
    // must not silently read as "no downstream impact" — this API exists
    // for schema-change safety (r10 advice)
    val resolver = spark.sessionState.conf.resolver
    val starts = nodes.filter(n => resolver(n.ident, name))
    // slot = (nodeId, Some(colIdx)) or (nodeId, None) = node-level
    type Slot = (String, Option[Int])
    val startSlots: Seq[Slot] = column match {
      case None => starts.map(n => (n.uniqueId, None))
      case Some(c) => starts.flatMap { n =>
        val i = n.attributes.indexWhere(a => resolver(a, c))
        if (i >= 0) Some((n.uniqueId, Some(i))) else None
      }
    }
    val bySrc = edges.groupBy(_.fromId)
    val visited = mutable.HashSet[Slot](startSlots: _*)
    val impacted = mutable.SortedSet[String]()
    var frontier: Seq[Slot] = startSlots
    var depth = 0
    while (frontier.nonEmpty && depth < 128) {
      frontier = frontier.flatMap { case (id, idx) =>
        bySrc.getOrElse(id, Nil).collect {
          // a node-level start (or slot) follows every outgoing edge; a
          // column slot follows its own column's edges plus node-level
          // edges (fromIdx None): those make no column claim
          case e if idx.isEmpty || e.fromIdx.isEmpty || e.fromIdx == idx =>
            (e.toId, e.toIdx)
        }
      }.distinct.filterNot(visited.contains)
      frontier.foreach { s =>
        visited += s
        nodeById.get(s._1).foreach { n =>
          if (n.tpe != FlowNodeType.Plan && n.tpe != FlowNodeType.LeafPlan &&
            !starts.exists(_.uniqueId == n.uniqueId)) impacted += n.ident
        }
      }
      depth += 1
    }
    impacted.toSeq
  }

  /** The lineage graph as (nodes, edges) DataFrames — SQL-queryable. */
  def lineageDatasets(spark: SparkSession, contracted: Boolean = false)
      : (Dataset[_], Dataset[_]) = {
    val session = spark.asInstanceOf[ClassicSession]
    import session.implicits._
    val (nodes, edges) = catalogGraph(spark, contracted)
    val nodeRows = nodes.map(n =>
      (n.uniqueId, n.ident, n.attributes, n.schemaDDL, n.tpe.label, n.isCached))
      .toDF("unique_id", "ident", "attributes", "schema_ddl", "node_type", "is_cached")
    val edgeRows = edges.map(e => (e.fromId, e.fromIdx, e.toId, e.toIdx))
      .toDF("from_id", "from_idx", "to_id", "to_idx")
    (nodeRows, edgeRows)
  }
}

/** Per-Dataset methods via implicit conversion (reference: SQLFlow.scala:856-881):
  * {{{
  *   import org.apache.spark.sql.graft.implicits._
  *   df.saveAsSQLFlow(Map("outputDirPath" -> "/tmp/flow"))
  *   println(df.printAsSQLFlow())
  * }}}
  */
object implicits {
  implicit class SQLFlowHolder[T](ds: Dataset[T]) {
    /** Scala analogue of the reference's Python `@auto_tracking` decorator
      * (python/sqlflow.py:51-133): registers the Dataset as a temp view
      * named `name` so catalog-mode lineage connects DataFrame chains
      * across pipeline stages, and returns the Dataset for fluent use. */
    def track(name: String): Dataset[T] = {
      ds.createOrReplaceTempView(name)
      ds
    }
    def saveAsSQLFlow(
        options: Map[String, String] = Map.empty,
        contracted: Boolean = false,
        graphSink: FlowBatchSink = GraphVizSink()): Unit = {
      val (nodes, edges) = SQLFlow.datasetGraph(ds, contracted)
      graphSink.write(nodes, edges, options)
    }

    def printAsSQLFlow(
        contracted: Boolean = false,
        graphFormat: FlowFormat = GraphVizSink()): String = {
      val (nodes, edges) = SQLFlow.datasetGraph(ds, contracted)
      graphFormat.toGraphString(nodes, edges)
    }
  }
}
