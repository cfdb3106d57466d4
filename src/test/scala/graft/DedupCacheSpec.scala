package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The d08 df-stoplist lever (candidate pruning must not change results on
  * the fixture, and must collapse the Σ df² candidate blow-up on a
  * heavy-hitter corpus) and the unpersist discipline of the dedup family's
  * shared intermediates. */
class DedupCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("dedup-cache-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  import org.apache.spark.sql.graft.functions.token_shingle_hashes

  private def shingles(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), token_shingle_hashes(col("text"), 3).as("sh"))

  test("stoplisted exact join equals the default path on the fixture") {
    val sh = shingles(spark.read.parquet(s"$sf/documents.parquet"))
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = toSet(DedupQueries.exactJaccardPairsOf(sh))
    val stoplisted = toSet(DedupQueries.exactJaccardPairsOf(sh, dfStopThreshold = Some(50L)))
    assert(base.nonEmpty)
    assert(stoplisted === base)
  }

  test("stoplist collapses the candidate count on a heavy-hitter corpus") {
    import spark.implicits._
    // every doc shares a 6-token boilerplate prefix → 4 shingles with
    // df = 200 generate C(200,2) = 19900 candidates without the stoplist;
    // the per-doc tail is unique, so none of the pairs clear jaccard 0.5
    val docs = (1L to 200L)
      .map(i => (i, s"terms of service apply to everything unique$i token$i tail$i"))
      .toDF("doc_id", "text")
    val sh = shingles(docs)
    val without = DedupQueries.invertedCandidates(sh).count()
    val withStop = DedupQueries.invertedCandidates(sh, Some(20L)).count()
    assert(without === 19900L)
    assert(withStop === 0L)
    // and the REPORTED pair sets still agree (both empty: max jaccard 0.4)
    assert(DedupQueries.exactJaccardPairsOf(sh).count() ===
      DedupQueries.exactJaccardPairsOf(sh, Some(20L)).count())
  }

  test("dedup queries leave no new pinned blocks after releaseShared") {
    val sc = spark.sparkContext
    // reset state left by earlier suites sharing this JVM's session, and
    // let the non-blocking unpersists settle before snapshotting
    DedupQueries.releaseShared()
    val settle = System.currentTimeMillis() + 5000
    var last = -1
    while (System.currentTimeMillis() < settle &&
      { val n = sc.getPersistentRDDs.size; val changed = n != last; last = n; changed }) {
      Thread.sleep(200)
    }
    val before = sc.getPersistentRDDs.keySet
    Seq("d03_minhash_lsh", "d04_simhash", "d05_ngram_jaccard", "d07_embedding_neardup",
      "d08_jaccard_exact_join", "d09_dup_components", "d15_semdedup")
      .foreach(n => SparkEntry.queries(n)(spark, sf).count())
    assert(sc.getPersistentRDDs.keySet.size > before.size,
      "expected shared intermediates to be pinned mid-run")
    DedupQueries.releaseShared()
    // Dataset.unpersist is non-blocking: poll briefly
    val deadline = System.currentTimeMillis() + 10000
    def leaked() = sc.getPersistentRDDs.keySet -- before
    while (leaked().nonEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(leaked().isEmpty, s"still pinned after releaseShared: ${leaked()}")
  }
}
