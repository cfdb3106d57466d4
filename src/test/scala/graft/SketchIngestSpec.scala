package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for q105 (Count Sketch) and p03 (incremental
  * ingestion pipeline) beyond their DuckDB oracles: the sketch's
  * one-sided-error + mergeability guarantees, and the pipeline's routing
  * semantics on a crafted corpus with known duplicate structure. */
class SketchIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("sketch-ingest-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q105: the count-sketch median estimate is exact for collision-free keys " +
      "and the report's signed error column is consistent") {
    val rows = SparkEntry.queries("q105_count_sketch")(spark, sf)
      .select("part_key", "exact_cnt", "cs_est", "err").collect()
    assert(rows.length === 20, "top-20 report")
    rows.foreach(r => assert(r.getLong(3) === r.getLong(2) - r.getLong(1)))
    // recompute each reported key's 5 signed per-row estimates from the
    // cell table and check cs_est IS their median (the stored middle
    // value, d odd)
    import graft.queries.QueryDsl.tbl
    // the recomputation uses the SAME shared hash-family definition as
    // q105 and the streaming twin (graft.queries.CountSketch) — the spec
    // pins the median-extraction arithmetic, not a third hash copy
    import graft.queries.CountSketch
    def hashRows = array((0 until CountSketch.Rows).map(i =>
      struct(CountSketch.bucket(col("k"), i).as("b"),
        CountSketch.sign(col("k"), i).as("g"))): _*)
    val li = tbl(spark, sf, "lineitem").select(col("l_partkey").as("k"))
    val cells = li.select(posexplode(hashRows))
      .select(col("pos").as("i"), col("col.b").as("b"), col("col.g").as("g"))
      .groupBy("i", "b").agg(sum("g").as("cell"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perKey = li.distinct()
      .select(col("k"), posexplode(hashRows))
      .select(col("k"), col("pos").as("i"), col("col.b").as("b"), col("col.g").as("g"))
      .collect().groupBy(_.getLong(0))
    rows.foreach { r =>
      val ests = perKey(r.getLong(0)).map(p =>
        p.getLong(3) * cells((p.getInt(1), p.getLong(2)))).sorted
      assert(ests(CountSketch.MedianIdx - 1) === r.getLong(2),
        s"key ${r.getLong(0)}: cs_est ${r.getLong(2)} != median of ${ests.mkString(",")}")
    }
  }

  test("q105: the signed cell table is mergeable — two half-corpus sketches " +
      "sum cell-wise to the full sketch") {
    import graft.queries.QueryDsl.tbl
    import graft.queries.CountSketch
    val li = tbl(spark, sf, "lineitem").select(col("l_partkey").as("k"), col("l_orderkey"))
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      df.select(posexplode(array((0 until CountSketch.Rows).map(i =>
          struct(CountSketch.bucket(col("k"), i).as("b"),
            CountSketch.sign(col("k"), i).as("g"))): _*)))
        .select(col("pos").as("i"), col("col.b").as("b"), col("col.g").as("g"))
        .groupBy("i", "b").agg(sum("g").as("cell"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = cells(li)
    val left = cells(li.filter(col("l_orderkey") % 2 === 0))
    val right = cells(li.filter(col("l_orderkey") % 2 === 1))
    val merged = (left.keySet ++ right.keySet).map(k =>
      k -> (left.getOrElse(k, 0L) + right.getOrElse(k, 0L)))
      .filter(_._2 != 0L).toMap
    assert(merged === full.filter(_._2 != 0L),
      "cell-wise sum of two disjoint half-corpus sketches must equal the full sketch")
  }

  test("d26: the minhash estimate is unbiased within the fixture's statistical " +
      "envelope, and identical shingle sets estimate exactly 1000") {
    val rows = SparkEntry.queries("d26_minhash_estimator_audit")(spark, sf)
      .select("decile", "n_pairs", "mean_exact_milli", "mean_est_milli").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, n, ex, est) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= 0 && est <= 1000 && ex >= 0 && ex <= 1000)
      assert(d >= 0 && d <= 10)
      // unbiasedness: P(position match) = J exactly, so per-decile means
      // track within the sampling envelope (sigma/pair <= 88 milli at 32
      // perms; the 100-milli bound is ~3 sigma for the >= 20-pair cells)
      if (n >= 20) assert(math.abs(est - ex) <= 100,
        s"decile $d: mean est $est vs exact $ex over $n pairs")
    }
    // identical shingle sets -> identical signatures -> estimate 1000,
    // deterministically (a crafted twin pair placed in its own corpus).
    // Ids 2/4/9 all pass the entry's deterministic 20% doc_id-hash slice
    // (md5-prefix mod 5 < 1 — r13: the audit runs over a sampled slice),
    // so the whole crafted corpus is in scope exactly as before.
    val tmp = java.nio.file.Files.createTempDirectory("graft-d26-spec")
    try {
      import spark.implicits._
      Seq((2L, "alpha beta gamma delta epsilon"),
        (4L, "alpha beta gamma delta epsilon"),
        (9L, "one two three four five six"))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("crafted"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("d26_minhash_estimator_audit")(spark, tmp.toString)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      // the twin pair is the only shared-shingle pair: decile 10, est 1000
      assert(out === Map(10 -> ((1L, 1000L))), out.toString)
    } finally {
      import java.nio.file.Files
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }

  /** p03's arrival fold is md5(doc_id)-bucketed (t07's split): solve for
    * ids on each side of the fold so the crafted corpus can place docs
    * deliberately. */
  private def bucket(id: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  test("p03: crafted corpus routes exact-dup / near-dup / fresh arrivals correctly") {
    val baseIds = (0L to 200L).filter(bucket(_) < 80)
    val arrIds = (0L to 200L).filter(bucket(_) >= 80)
    assert(baseIds.size >= 3 && arrIds.size >= 6)
    val baseText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val freshTokens = (1 to 200).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // base
      (baseIds(0), baseText),
      (baseIds(1), "one two three four five six seven"),
      (baseIds(2), "tiny pair"), // a SHORT base doc (< 3 tokens, no shingles)
      // arrivals
      (arrIds(0), baseText.toUpperCase), // exact dup modulo case-normalization
      (arrIds(1), "alpha beta gamma delta epsilon different tail here"), // >= 3 shared shingles
      (arrIds(2), freshTokens), // fresh, 200 tokens -> 4 chunks
      (arrIds(3), freshTokens), // intra-batch twin of arrIds(2): dedup is vs BASE only
      // short docs (< 3 tokens) bypass the shingle stage entirely but the
      // digest stage still sees them: the twin is exact_dup, the other
      // ingests with one chunk
      (arrIds(4), "TINY pair"),
      (arrIds(5), "novel short")
    )
    val tmp = java.nio.file.Files.createTempDirectory("graft-p03-spec")
    try {
      import spark.implicits._
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("crafted"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("p03_incremental_ingest")(spark, tmp.toString)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(out.keySet === arrIds.take(6).toSet, "one ledger row per arrival, none for base")
      assert(out(arrIds(0))._1 === "exact_dup")
      assert(out(arrIds(1))._1 === "near_dup")
      assert(out(arrIds(2))._1 === "ingested")
      // dedup is vs the BASE corpus only — intra-batch twins both ingest
      // (collapsing them is d01/d02's batch-dedup job, staged before p03)
      assert(out(arrIds(3))._1 === "ingested")
      // 200 tokens -> 1 + ceil(136/48) = 4 chunks; shards within [1, 4]
      val (_, nChunks, nShards) = out(arrIds(2))
      assert(nChunks === 4L)
      assert(nShards >= 1L && nShards <= 4L)
      // rejected docs touch the index zero times
      assert(out(arrIds(0))._2 === 0L && out(arrIds(0))._3 === 0L)
      assert(out(arrIds(1))._2 === 0L && out(arrIds(1))._3 === 0L)
      // short docs: the digest stage still catches the case-folded twin of
      // the < 3-token base doc; the novel short doc ingests as one chunk
      assert(out(arrIds(4))._1 === "exact_dup")
      assert(out(arrIds(5)) === (("ingested", 1L, 1L)))
    } finally {
      import java.nio.file.Files
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }

  test("p03: on the real corpus every arrival gets exactly one verdict and " +
      "chunk math holds for every ingested doc") {
    import graft.queries.QueryDsl.tbl
    val out = SparkEntry.queries("p03_incremental_ingest")(spark, sf)
    val nArrivals = tbl(spark, sf, "documents")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100 >= 80).count()
    assert(out.count() === nArrivals)
    val bad = out.filter(!col("verdict").isin("exact_dup", "near_dup", "ingested"))
    assert(bad.count() === 0)
    val ing = out.filter(col("verdict") === "ingested")
    assert(ing.filter(col("n_chunks") < 1 || col("n_shards") < 1 ||
      col("n_shards") > least(col("n_chunks"), lit(16L))).count() === 0)
    assert(out.filter(col("verdict") =!= "ingested")
      .filter(col("n_chunks") =!= 0 || col("n_shards") =!= 0).count() === 0)
  }
}
