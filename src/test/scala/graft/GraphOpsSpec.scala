package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graph-ops-spec")
    .getOrCreate()

  import spark.implicits._

  // chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}, self-contained node via pair {30,30}
  private def pairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (11L, 12L), (10L, 12L),
    (20L, 21L), (30L, 30L)).toDF("doc_a", "doc_b")

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L, 30L -> 30L)

  test("driver union-find path labels components with their min id") {
    val got = GraphOps.connectedComponents(pairs, maxDriverPairs = 1000000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("distributed min-label propagation path produces identical labels") {
    val got = GraphOps.connectedComponents(pairs, maxDriverPairs = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("distributed path pins only the final label set after completion") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = GraphOps.connectedComponents(pairs, maxDriverPairs = 0)
    out.collect()
    // intermediate localCheckpoint snapshots (initial labels + one per
    // round) must be released; only the returned label set may remain
    val deadline = System.currentTimeMillis() + 10000
    def extra() = sc.getPersistentRDDs.keySet -- before
    while (extra().size > 1 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(extra().size <= 1, s"leaked checkpoints: ${extra()}")
  }

  test("alternating large-star/small-star produces identical labels") {
    val got = GraphOps.connectedComponentsAlternating(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("alternating converges in O(log² n) rounds on a diameter-300 chain " +
    "(where min-label propagation needs 300)") {
    val chain = (1L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = GraphOps.alternatingWithRounds(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 300L).map(_ -> 1L).toMap)
    // measured: 10 rounds (incl. the fixpoint-detection round) vs the 300
    // one-hop propagations min-label would need — the whole point
    assert(rounds <= 12, s"expected logarithmic convergence, took $rounds rounds")
  }

  test("alternating equals union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val rp = Seq.fill(400)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    val want = GraphOps.connectedComponents(rp, maxDriverPairs = 1000000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GraphOps.connectedComponentsAlternating(rp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("alternating equals union-find across 8 random topologies " +
    "(density sweep incl. near-empty and super-connected)") {
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { t =>
      val n = 10 + rnd.nextInt(80)
      // density sweeps from m ≈ n/4 (forest of fragments) to m ≈ 3n
      // (one giant component) across trials
      val m = 1 + rnd.nextInt(3 * n)
      val ps = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      if (ps.nonEmpty) {
        val df = ps.toDF("doc_a", "doc_b")
        val want = GraphOps.connectedComponents(df, maxDriverPairs = 1000000)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val got = GraphOps.connectedComponentsAlternating(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"trial $t (n=$n m=$m)")
      }
    }
  }

  test("alternating pins no intermediate checkpoints after completion") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    GraphOps.connectedComponentsAlternating(pairs).collect()
    val deadline = System.currentTimeMillis() + 10000
    def extra() = sc.getPersistentRDDs.keySet -- before
    while (extra().size > 1 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(extra().size <= 1, s"leaked checkpoints: ${extra()}")
  }

  test("distributed path converges on chains longer than one round block") {
    // chain 1-2-...-9 with rounds=2: needs the convergence loop, not the
    // fixed block, to reach the fixpoint
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = GraphOps.connectedComponents(chain, maxDriverPairs = 0, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 9L).map(_ -> 1L).toMap)
  }

  private def core(df: org.apache.spark.sql.DataFrame, k: Int, rounds: Int): Map[Long, Long] =
    GraphOps.kcore(df, k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-core: chains dissolve, cycles survive with their in-core degrees") {
    // triangle {1,2,3} with a dangling tail 3-4-5, plus an isolated pair
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    // tail and pair peel away; the triangle stays with degree 2 each
    assert(core(g, 2, 8) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // 3-core of a triangle is empty (no node has 3 in-core neighbors)
    assert(core(g, 3, 8) === Map.empty)
  }

  test("kcore canonicalizes its input: dups, reversed orientations, self-loops don't inflate degrees") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    // the same graph with every corruption the r9 advice flagged: a
    // duplicated row, the reversed orientation of an existing pair, and
    // self-loops — none may change the core
    val dirty = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (2L, 3L),           // duplicate row
      (3L, 1L), (2L, 1L), // reversed orientations
      (4L, 4L), (1L, 1L)  // self-loops
    ).toDF("doc_a", "doc_b")
    val want = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(core(clean, 2, 8) === want)
    assert(core(dirty, 2, 8) === want,
      "duplicate / reversed / self-loop rows must not inflate the core")
    // without canonicalization the self-looped pair {4,5} would fake
    // degree 2 and survive a 2-core peel
    val loops = Seq((4L, 5L), (4L, 4L), (5L, 5L)).toDF("doc_a", "doc_b")
    assert(core(loops, 2, 4) === Map.empty)
  }

  test("a long dangling path peels one node per round — fixed rounds must cover the depth") {
    // cycle {1,2,3} + path 3-10-11-...-15 (depth 5). With rounds=2 the
    // far end of the path is still alive (NOT the k-core); by rounds=5
    // the peel reaches the fixpoint and more rounds change nothing.
    val path = Seq((3L, 10L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L))
    val g = (Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++ path).toDF("doc_a", "doc_b")
    val truncated = core(g, 2, 2)
    val fix = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(truncated !== fix, "2 rounds must NOT have finished a depth-6 peel")
    assert(core(g, 2, 6) === fix)
    assert(core(g, 2, 12) === fix, "extra rounds past the fixpoint are no-ops")
  }

  test("d23 fixture core is a true fixpoint and every survivor has degree >= k") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.graft.functions.token_shingle_hashes
    // the same exact >= 0.5 pair set d23 builds internally, via the
    // (independent) prefix-filter kernel
    val sets = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id").as("id"),
        token_shingle_hashes(org.apache.spark.sql.functions.col("text"), 3).as("sh"))
    val pairs05 = graft.operators.PrefixFilterOps
      .jaccardSelfJoin(sets, "id", "sh", 1, 2)
      .select("id_a", "id_b")
    val at8 = core(pairs05, 2, 8)
    val at12 = core(pairs05, 2, 12)
    assert(at8 === at12, "the fixture peel must have converged by round 8")
    assert(at8.nonEmpty && at8.values.forall(_ >= 2))
    val d23 = SparkEntry.queries("d23_dup_kcore")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d23 === at8, "d23 must equal the independently-built 2-core")
  }
}
