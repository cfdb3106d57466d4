package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointUtils.SummarizedCheckpointOps

/** Connected components over an undirected pair list `(doc_a, doc_b)`:
  * every node is labeled with the MIN node id of its component.
  *
  * Hybrid execution, like production dedup pipelines:
  *   - when the pair set is bounded (`<= maxDriverPairs`, a few MB), a
  *     driver-side union-find resolves components exactly in one pass —
  *     the same driver-bounded-state trade k-means makes for centroids;
  *   - beyond that, distributed min-label propagation with
  *     `localCheckpoint` between rounds (the iterative-DataFrame pattern:
  *     eager checkpoints truncate the growing plan), `rounds` bounding the
  *     reachable diameter.
  * Both paths produce identical labels (GraphOpsSpec proves it).
  */
object GraphOps {

  def connectedComponents(
      pairs: DataFrame,
      maxDriverPairs: Long = 1000000L,
      rounds: Int = 6): DataFrame = {
    require(rounds > 0, "rounds must be positive (0 would trivially 'converge' on identity labels)")
    val spark = pairs.sparkSession
    val edges = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .union(pairs.select(col("doc_b").cast("long"), col("doc_a").cast("long")))
      .toDF("doc_a", "doc_b")
      .persist()
    val nPairs = edges.count() / 2

    if (nPairs <= maxDriverPairs) {
      // driver union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      graft.queries.QueryDsl.boundedCollect(
        edges.filter(col("doc_a") < col("doc_b")),
        maxDriverPairs, "union-find edges (guarded: nPairs <= maxDriverPairs)")
        .foreach { e =>
        val (a, b) = (e.getLong(0), e.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        else { parent.getOrElseUpdate(a, ra); parent.getOrElseUpdate(b, rb) }
      }
      val nodes = graft.queries.QueryDsl.boundedCollect(
        edges.select(col("doc_a").as("id")).distinct(),
        2L * maxDriverPairs, "union-find node ids (<= 2 per guarded pair)")
        .map(_.getLong(0))
      edges.unpersist()
      val rows = nodes.map(n => (n, find(n))).toSeq
      import spark.implicits._
      rows.toDF("doc_id", "component")
    } else {
      var labels = edges.select(col("doc_a").as("id")).distinct()
        .withColumn("comp", col("id"))
        .summarizedCheckpoint()
      // blocks of `rounds` propagation steps, then one convergence probe on
      // the block's LAST step: min-propagation is monotone, so a round that
      // changed nothing proves the fixpoint — correct for ANY component
      // diameter, and the probe costs one extra action per block
      var converged = false
      var blocks = 0
      var older: DataFrame = null
      while (!converged && blocks < 64) {
        var prev = labels
        for (_ <- 0 until rounds) {
          prev = labels
          val nbrMin = edges
            .join(labels.select(col("id").as("doc_b"), col("comp").as("nbr_comp")), "doc_b")
            .groupBy(col("doc_a").as("id"))
            .agg(min(col("nbr_comp")).as("nbr_min"))
          labels = labels.join(nbrMin, Seq("id"), "left")
            .select(col("id"), least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
            .summarizedCheckpoint()
          // drop checkpoint snapshots older than `prev` (still needed for
          // the convergence probe) — otherwise every round pins a full
          // label-set copy in the block manager. NOTE: Dataset.unpersist is
          // a CacheManager call and ignores checkpoint blocks; the backing
          // RDD itself must be unpersisted (CheckpointUtils)
          if (older != null) {
            org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(older)
          }
          older = prev
        }
        converged = labels
          .join(prev.withColumnsRenamed(Map("comp" -> "old_comp")), "id")
          .filter(col("comp") =!= col("old_comp")).isEmpty
        blocks += 1
      }
      // never return silently-wrong labels: min-label propagation moves a
      // component's min at least one hop per round, so rounds*64 bounds any
      // realistic diameter — beyond that, fail loudly
      require(converged,
        s"connectedComponents did not converge within ${rounds * 64} propagation rounds")
      // the convergence probe is done: release the trailing snapshots so
      // only the FINAL label set (the returned data) stays in the block
      // manager — `older` is the last round's predecessor here
      if (older != null && older.ne(labels)) {
        org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(older)
      }
      val out = labels.select(col("id").as("doc_id"), col("comp").as("component"))
      edges.unpersist()
      out
    }
  }

  /** Connected components by ALTERNATING large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the production-scale sibling of [[connectedComponents]]:
    * min-label propagation needs O(diameter) rounds, so a chain-shaped
    * duplicate graph (doc A ≈ B ≈ C ≈ … — exactly what boilerplate
    * families look like in a web corpus) costs one full shuffle per HOP;
    * the alternating algorithm contracts every star toward its minimum in
    * both phases and provably converges in O(log² n) rounds on ANY
    * topology, each round two bounded shuffles over the (shrinking) edge
    * list. Neither phase materializes a neighbor list: the per-node min is
    * a groupBy aggregate joined back onto the edges, so a supernode (the
    * root of a huge component) never collects its members into one row —
    * per-task state stays bounded at any component size.
    *
    *   large-star: every edge (u,v), v > u, re-points v at m(u) =
    *               min(N(u) ∪ u) — strictly-larger neighbors hop to the
    *               star's current minimum;
    *   small-star: every edge (u,v), v < u, re-points v (and u) at
    *               m(u) = min of u's smaller neighborhood — the star
    *               flattens onto its minimum.
    *
    * Both phases preserve connectivity exactly (each replaced edge is
    * covered by a path through m); the fixpoint is a forest of depth-1
    * stars rooted at each component's min id. Labels equal
    * [[connectedComponents]]'s on any input (GraphOpsSpec proves it,
    * including a diameter-300 chain that converges here in ≤ 8 rounds).
    *
    * Returns (doc_id, component = min id of the component), one row per
    * non-isolated node — the [[connectedComponents]] contract. */
  def connectedComponentsAlternating(pairs: DataFrame, maxRounds: Int = 32): DataFrame =
    alternatingWithRounds(pairs, maxRounds)._1

  /** [[connectedComponentsAlternating]] plus the round count it converged
    * in — exposed for the spec that pins the O(log² n) round bound. */
  private[graft] def alternatingWithRounds(
      pairs: DataFrame, maxRounds: Int = 32): (DataFrame, Int) = {
    val xy = pairs
      .select(col("doc_a").cast("long").as("x"), col("doc_b").cast("long").as("y"))
    // nodes listed up front so self-loop-only nodes keep their singleton
    // label (the connectedComponents contract)
    val nodes = xy.select(col("x").as("doc_id"))
      .unionAll(xy.select(col("y").as("doc_id"))).distinct()
    val canon = xy
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
    var edges = canon.summarizedCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // large-star: symmetrize, per-node min over N(u) ∪ {u}, strictly
      // larger neighbors re-point at it. m < v always, so (m, v) is
      // canonical by construction.
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .distinct()
      // small-star: only the smaller-side neighborhood (v < u); u and all
      // its smaller neighbors re-point at its min m ≤ v < u.
      val smalls = ls.select(col("b").as("u"), col("a").as("v"))
      val smins = smalls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = smalls.join(smins, "u").filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .unionAll(smins.select(col("m").as("a"), col("u").as("b")))
        .distinct()
        .summarizedCheckpoint()
      // fixpoint test = star form, checked structurally: a canonical edge
      // set is a disjoint star forest iff (1) no node appears in both
      // columns (a node that is sometimes parent, sometimes child has
      // depth ≥ 2 — small-star re-points it) and (2) every child has ONE
      // parent (two parents for one child is a 2-level bipartite shape
      // that small-star collapses). Star form ⇒ both phases are identity
      // (the root is each star's min because edges are canonical), so
      // this IS convergence — probed as a single union-of-violations
      // action, cheaper than the two exceptAll passes set-equality costs
      val abOverlap = ss.select(col("a").as("n"))
        .join(ss.select(col("b").as("n")), Seq("n"), "left_semi")
        .select(lit(1).as("viol"))
      val multiParent = ss.groupBy(col("b")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(lit(1).as("viol"))
      converged = abOverlap.unionAll(multiParent).isEmpty
      org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(edges)
      edges = ss
      rounds += 1
    }
    require(converged || rounds < maxRounds,
      s"alternating connected components did not converge in $maxRounds rounds")
    // star forest → labels: every b points at its root a; roots label
    // themselves; nodes with no surviving edge (self-loop-only) are their
    // own component
    val star = edges.select(col("b").as("doc_id"), col("a").as("component"))
      .unionAll(edges.select(col("a").as("doc_id"), col("a").as("component")))
      .distinct()
    val labels = nodes.join(star, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
    (labels, rounds)
  }

  /** k-CORE of the undirected graph given as unordered `pairs`
    * (doc_a, doc_b): the maximal subgraph in which every node has degree
    * ≥ k, computed by the textbook simultaneous-removal peel
    * alive_{i+1} = {v : deg within alive_i ≥ k}. The peel runs a FIXED
    * `rounds` iterations — the caller asserts convergence (one tail node
    * peels per round in the worst chain, so a diameter-R dangling path
    * needs R rounds; duplicate-pair graphs converge in a handful). Fixed
    * rounds keep the computation replayable in an unrolled-CTE oracle.
    *
    * Returns (doc_id, core_degree) for surviving nodes. Scale shape: each
    * round is two id-keyed semi-joins + one partial-aggregated count over
    * the PAIR graph (≪ corpus); alive shrinks monotonically and
    * localCheckpoint truncates the doubling plan (each round references
    * alive twice — unchecked, the lazy plan would grow 2^rounds). */
  def kcore(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and rounds >= 1")
    // canonicalize like connectedComponentsAlternating: drop self-loops,
    // orient each pair (least, greatest), dedupe — duplicate rows, both
    // orientations of one pair, or self-loops would otherwise silently
    // inflate degrees and yield a wrong core (r9 advice)
    val in = pairs.toDF("x", "y")
    val canon = in.filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("v"), greatest(col("x"), col("y")).as("u"))
      .distinct()
    val und = canon
      .union(canon.select(col("u").as("v"), col("v").as("u")))
      .summarizedCheckpoint()
    var alive = und.select("v").distinct().summarizedCheckpoint()
    for (_ <- 1 to rounds) {
      alive = und
        .join(alive, "v")
        .join(alive.withColumnRenamed("v", "u"), "u")
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("v")
        .summarizedCheckpoint()
    }
    und.join(alive, "v")
      .join(alive.withColumnRenamed("v", "u"), "u")
      .groupBy("v").agg(count(lit(1)).as("core_degree"))
      .select(col("v").as("doc_id"), col("core_degree"))
  }
}
