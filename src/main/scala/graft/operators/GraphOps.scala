package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
      edges.filter(col("doc_a") < col("doc_b")).collect().foreach { e =>
        val (a, b) = (e.getLong(0), e.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        else { parent.getOrElseUpdate(a, ra); parent.getOrElseUpdate(b, rb) }
      }
      val nodes = edges.select(col("doc_a").as("id")).distinct()
        .collect().map(_.getLong(0))
      edges.unpersist()
      val rows = nodes.map(n => (n, find(n))).toSeq
      import spark.implicits._
      rows.toDF("doc_id", "component")
    } else {
      var labels = edges.select(col("doc_a").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint()
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
            .localCheckpoint()
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
}
