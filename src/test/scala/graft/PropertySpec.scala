package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded) property tests for the custom Catalyst pieces:
  * generated inputs driven through the real Column/codegen path, checked
  * against reference formulations built from Spark built-ins. */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("property-spec")
    .getOrCreate()

  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val alphabet = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "  ..,,--!!__//\t"

  private def randString(): String =
    Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString

  test("normalize_text equals the regex pipeline on 500 random ASCII strings") {
    val strings = Seq.fill(500)(randString())
    val df = strings.toDF("t")
    val regexForm = trim(regexp_replace(regexp_replace(lower($"t"), "[^a-z0-9 ]", ""), " +", " "))
    val bad = df.filter(normalize_text($"t") =!= regexForm)
    assert(bad.count() === 0, bad.collect().take(3).mkString("; "))
  }

  test("top_k_struct survives the sort-based aggregation fallback (many groups)") {
    // ObjectHashAggregate falls back to sort-based aggregation past
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold (128)
    // distinct keys per partition — that path round-trips the buffer
    // through serialize/deserialize
    val n = 5000
    val rows = (0 until n).map(i => (i % 1000, (i * 2654435761L) % 10000))
    val df = rows.toDF("g", "v")
    val got = df.groupBy("g")
      .agg(top_k_struct(struct($"v"), 2).as("top"))
      .select($"g", explode($"top.v").as("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList.sorted
    val expected = rows.groupBy(_._1).toList.flatMap { case (g, vs) =>
      vs.map(_._2).sorted.take(2).map(g -> _)
    }.sorted
    assert(got === expected)
  }

  test("top_k_struct equals sort-ascending take(k) across random groups and k") {
    for (trial <- 0 until 5) {
      val k = 1 + rnd.nextInt(8)
      val rows = Seq.fill(300)((rnd.nextInt(6), rnd.nextLong() % 1000))
      val df = rows.toDF("g", "v")
      val got = df.groupBy("g")
        .agg(top_k_struct(struct($"v"), k).as("top"))
        .select($"g", explode($"top.v").as("v"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toList.sorted
      val expected = rows.groupBy(_._1).toList.flatMap { case (g, vs) =>
        vs.map(_._2).sorted.take(k).map(g -> _)
      }.sorted
      assert(got === expected, s"trial=$trial k=$k")
    }
  }

  test("cdc_chunk_hashes: edits anywhere in random blobs leave distant chunks aligned") {
    // for random payloads with a random single-byte insertion, CDC must
    // keep a large majority of chunks shared (re-alignment), and chunk
    // counts must track payload size (no degenerate single-chunk outputs)
    for (trial <- 0 until 5) {
      val base = new Array[Byte](1500 + rnd.nextInt(1500))
      rnd.nextBytes(base)
      val pos = rnd.nextInt(base.length)
      val edited = (base.take(pos) :+ rnd.nextInt(256).toByte) ++ base.drop(pos)
      val Array(cBase, cEdit) = Seq(base, edited).toDF("b")
        .select(cdc_chunk_hashes($"b").as("c")).collect().map(_.getSeq[Long](0))
      assert(cBase.size >= base.length / 300,
        s"trial=$trial: too few chunks (${cBase.size}) for ${base.length} bytes")
      val shared = cBase.toSet.intersect(cEdit.toSet).size
      // the edit can disturb the chunk containing it plus a bounded number
      // of neighbors before boundaries re-align
      assert(shared >= cBase.size - 4,
        s"trial=$trial: only $shared of ${cBase.size} chunks survived an edit at $pos")
    }
  }

  test("bloom_count_hits has no false negatives across random digests and probes") {
    for (trial <- 0 until 5) {
      val members = Seq.fill(500)(rnd.nextLong()).distinct
      val bf = org.apache.spark.util.sketch.BloomFilter.create(members.size.toLong, 0.03)
      members.foreach(bf.putLong)
      val probes = Seq.fill(50)(
        (Seq.fill(rnd.nextInt(20))(members(rnd.nextInt(members.size))) ++
          Seq.fill(rnd.nextInt(20))(rnd.nextLong())).toArray)
      val got = probes.toDF("a").select(bloom_count_hits($"a", bf).as("h"))
        .collect().map(_.getInt(0))
      probes.zip(got).foreach { case (arr, hits) =>
        val memberCount = arr.count(members.toSet)
        // one-sided error: every true member counts; false positives only add
        assert(hits >= memberCount && hits <= arr.length, s"trial=$trial")
      }
    }
  }
}
