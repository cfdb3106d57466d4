package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixFilterOps

/** PrefixFilterOps — the AllPairs/PPJoin prefix-filtered exact Jaccard
  * self-join behind d22. */
class PrefixFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("prefix-filter-spec")
    .getOrCreate()

  import spark.implicits._

  private def setsDf(sets: Seq[(Long, Seq[Long])]): DataFrame =
    sets.map { case (id, s) => (id, s.distinct.sorted) }.toDF("id", "sh")

  /** Brute-force reference: broadcast cross join + exact intersection. */
  private def brute(sets: Seq[(Long, Seq[Long])], milliTau: Long): Set[(Long, Long, Long)] = {
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      ni = (sa.toSet & sb.toSet).size.toLong
      nu = sa.toSet.size + sb.toSet.size - ni
      m = 1000 * ni / nu if m >= milliTau
    } yield (ia, ib, m)).toSet
  }

  private def run(sets: Seq[(Long, Seq[Long])], tn: Int, td: Int): Set[(Long, Long, Long)] =
    PrefixFilterOps.jaccardSelfJoin(setsDf(sets), "id", "sh", tn, td)
      .as[(Long, Long, Long)].collect().toSet

  test("matches brute force on a randomized corpus (tau = 3/5)") {
    val rnd = new scala.util.Random(11)
    // 120 sets over a small universe with planted near-dup pairs
    val base = (0 until 120).map { i =>
      i.toLong -> Seq.fill(8 + rnd.nextInt(20))(rnd.nextInt(60).toLong)
    }
    val planted = base.take(15).map { case (id, s) =>
      // mutate one element → a high-Jaccard sibling
      (id + 1000) -> (s.distinct.drop(1) :+ 997L)
    }
    val sets = base ++ planted
    assert(run(sets, 3, 5) === brute(sets, 600))
  }

  test("boundary pairs: exactly tau is kept, just under tau is dropped") {
    val sets = Seq(
      1L -> Seq(1L, 2L, 3L, 4L),  // J(1,2) = 3/5 exactly → 600, kept
      2L -> Seq(2L, 3L, 4L, 5L),
      3L -> Seq(10L, 11L, 12L, 13L, 14L), // J(3,4) = 3/7 → 428, dropped
      4L -> Seq(12L, 13L, 14L, 15L))
    val got = run(sets, 3, 5)
    assert(got === Set((1L, 2L, 600L)))
  }

  test("identical and disjoint sets behave (1000 kept, 0 absent)") {
    val sets = Seq(1L -> Seq(1L, 2L, 3L), 2L -> Seq(1L, 2L, 3L), 3L -> Seq(9L))
    assert(run(sets, 3, 5) === Set((1L, 2L, 1000L)))
  }

  test("a universal heavy hitter never enters any prefix (rarest-first order)") {
    // every set shares element 999; with tau = 3/5 the prefix is ~2/5 of
    // the set and 999 (max df) sorts last — it must be absent from the
    // prefix posting list, so it can never flood a candidate bucket
    val rnd = new scala.util.Random(5)
    val sets = (0 until 40).map { i =>
      i.toLong -> (Seq.fill(12)(rnd.nextInt(500).toLong) :+ 999L)
    }
    val posting = setsDf(sets).select(col("id"),
      size(col("sh")).as("sz"), explode(col("sh")).as("h"))
    val prefixHashes = PrefixFilterOps.prefixPostings(posting, 3, 5)
      .select("h").as[Long].collect().toSet
    assert(!prefixHashes.contains(999L))
    // and exactness still holds with the heavy hitter in play
    assert(run(sets, 3, 5) === brute(sets, 600))
  }

  test("d22 on the fixture: prefix candidates strictly undercut the full inverted index") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.graft.functions.token_shingle_hashes
    val sets = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), token_shingle_hashes(col("text"), 3).as("sh"))
    val posting = sets.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("h"))
    def pairCount(p: DataFrame): Long = p.as("a").join(p.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    val full = pairCount(posting)
    val pref = pairCount(PrefixFilterOps.prefixPostings(posting, 3, 5))
    assert(pref < full, s"prefix candidates $pref should undercut full-index $full")
    // the cut is substantial on this corpus, not cosmetic
    assert(pref.toDouble / full < 0.5, s"only $pref/$full")
  }

  test("the positional upper bound prunes candidates beyond prefix + length " +
      "filters (and exactness held above)") {
    // replicate the operator's candidate join on the fixture corpus with
    // and without the PPJoin positional term (WWW'08 §3.1): a meeting at
    // prefix positions (i, j) admits at most 1 + min(sz_a - i, sz_b - j)
    // common elements, so meetings that cannot reach the overlap
    // threshold alpha never enter the distinct/verify stages
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.graft.functions.token_shingle_hashes
    val sets = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), token_shingle_hashes(col("text"), 3).as("sh"))
    val posting = sets.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("h"))
    val p = PrefixFilterOps.prefixPostings(posting, 3, 5)
    // BOTH sides bind to the operator's own predicates (candidateCond and
    // its prefixLengthCond baseline), so a regression in the production
    // positional term fails here and a change to the length-filter form
    // moves the baseline with it (r14 review: a locally spelled-out
    // baseline had already drifted to int arithmetic)
    def cand(cond: org.apache.spark.sql.Column): Long =
      p.as("a").join(p.as("b"), cond)
        .select(col("a.id"), col("b.id")).distinct().count()
    val without = cand(PrefixFilterOps.prefixLengthCond(3, 5))
    val withPos = cand(PrefixFilterOps.candidateCond(3, 5))
    assert(withPos < without,
      s"positional bound should strictly cut candidates: $withPos vs $without")
  }

  test("irrational milli thresholds are rejected") {
    val e = intercept[IllegalArgumentException] {
      PrefixFilterOps.jaccardSelfJoin(setsDf(Seq(1L -> Seq(1L))), "id", "sh", 1, 3)
    }
    assert(e.getMessage.contains("milli"))
  }

  test("duplicate-bearing element arrays are deduped at entry, not silently skewed") {
    // bypass setsDf's dedup: feed raw arrays WITH duplicates and assert the
    // result equals the brute force over the underlying SETS — the entry
    // array_distinct enforces the documented precondition (r10 advice)
    val raw = Seq(
      1L -> Seq(1L, 1L, 2L, 3L, 4L, 4L, 4L),  // set {1,2,3,4}
      2L -> Seq(2L, 2L, 3L, 4L, 5L),          // set {2,3,4,5}: J = 3/5
      3L -> Seq(7L, 7L, 7L, 7L, 7L, 7L, 8L),  // set {7,8}
      4L -> Seq(7L, 8L, 8L))                   // set {7,8}: J = 1
    val got = PrefixFilterOps.jaccardSelfJoin(
        raw.toDF("id", "sh"), "id", "sh", 3, 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(raw, 600))
    assert(got === Set((1L, 2L, 600L), (3L, 4L, 1000L)))
  }

  test("UNSORTED duplicate-bearing arrays are normalized at entry (r17: the " +
      "verify step is a sorted-merge count, so enforcement must sort too)") {
    // reverse/shuffled element order AND duplicates: the default path's
    // array_sort(array_distinct(..)) must make the sorted-merge verify
    // exact; without the sort this undercounts |a∩b| silently
    val raw = Seq(
      1L -> Seq(4L, 1L, 3L, 1L, 2L, 4L),      // set {1,2,3,4}, descending-ish
      2L -> Seq(5L, 4L, 3L, 2L, 2L),          // set {2,3,4,5}: J = 3/5
      3L -> Seq(8L, 7L, 7L),                   // set {7,8}
      4L -> Seq(8L, 8L, 7L))                   // set {7,8}: J = 1
    val got = PrefixFilterOps.jaccardSelfJoin(
        raw.toDF("id", "sh"), "id", "sh", 3, 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(raw, 600))
    assert(got === Set((1L, 2L, 600L), (3L, 4L, 1000L)))
  }

  test("nullable-element arrays analyze and compute: enforcement compacts " +
      "nulls away (r18: sorted_intersect_count rejects containsNull types)") {
    // a containsNull=true column (Option-encoded) must not fail analysis
    // at the verify step — the entry pass drops null slots (null is not
    // an element hash) and narrows the type before sorting/deduping
    val raw = Seq(
      (1L, Seq[Option[Long]](Some(4L), None, Some(1L), Some(3L), Some(2L))),
      (2L, Seq[Option[Long]](Some(5L), Some(4L), None, None, Some(3L), Some(2L))),
      (3L, Seq[Option[Long]](Some(7L), Some(8L))),
      (4L, Seq[Option[Long]](None, Some(8L), Some(7L))))
    val df = raw.toDF("id", "sh")
    assert(df.schema("sh").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val got = PrefixFilterOps.jaccardSelfJoin(df, "id", "sh", 3, 5)
      .as[(Long, Long, Long)].collect().toSet
    val asSets = raw.map { case (id, s) => id -> s.flatten }
    assert(got === brute(asSets, 600))
    assert(got === Set((1L, 2L, 600L), (3L, 4L, 1000L)))
  }

  test("assumeDistinct=true with a containsNull=true SCHEMA on null-free " +
      "sorted-distinct arrays analyzes and computes (r18 advice: the trusted " +
      "branch narrows schema-only nullability zero-cost)") {
    // Option-encoded but null-free by construction: the r18 containsNull
    // rejection in sorted_intersect_count must not fail a TRUSTED caller
    // whose arrays satisfy the contract — only the SCHEMA says nullable.
    // The trusted branch must not pay array_compact's per-row scan either:
    // it applies known_elements_not_null (identity eval, narrowed type).
    val raw = Seq(
      (1L, Seq[Option[Long]](Some(1L), Some(2L), Some(3L), Some(4L))),
      (2L, Seq[Option[Long]](Some(2L), Some(3L), Some(4L), Some(5L))),
      (3L, Seq[Option[Long]](Some(7L), Some(8L))),
      (4L, Seq[Option[Long]](Some(7L), Some(8L))))
    val df = raw.toDF("id", "sh")
    assert(df.schema("sh").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val got = PrefixFilterOps.jaccardSelfJoin(df, "id", "sh", 3, 5,
        assumeDistinct = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(raw.map { case (id, s) => id -> s.flatten }, 600))
    assert(got === Set((1L, 2L, 600L), (3L, 4L, 1000L)))
  }
}
