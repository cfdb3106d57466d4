package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope probe (r13 verdict item 7): measure the PPJoin positional
  * filter's candidate cut — and d22-vs-d08 corpus-shape guidance — on a
  * ZIPFIAN-element corpus, where prefix filtering is actually the right
  * tool. The committed bench corpus is df-flat (shingles of synthetic
  * text are near-unique), so the positional bound's measured value there
  * (~10%) is corpus-shape-limited by construction
  * (PrefixFilterOps.scala's trade-off note); this probe generates element
  * sets whose element frequencies follow Zipf(s) and reports, per corpus:
  *
  *   - posting_pairs: Σ_h df(h)·(df(h)−1)/2 — the candidate pairs a
  *     direct inverted-index join (d08's shape, pre-stoplist) generates;
  *   - prefix_length_pairs: candidates admitted by prefix + length
  *     filtering alone;
  *   - positional_pairs: candidates admitted by prefix + length +
  *     positional (the shipped candidateCond) — the delta vs the line
  *     above is the positional filter's cut;
  *   - true_pairs + end-to-end wall of the shipped jaccardSelfJoin.
  *
  * Zipf sampling is closed-form inverse-CDF (continuous approximation):
  * rank(u) = (1 + u·(V^(1−s) − 1))^(1/(1−s)) for s ≠ 1 — libm on a PROBE
  * path only, never an oracle replay. Deterministic via xxhash64(doc, i).
  *
  * Corpus shape notes (first attempt OOM'd, instructively): V must be
  * LARGE relative to the corpus's total element draws — a 50k vocab over
  * 600k docs makes EVERY element df≈240+, so even rarest-first prefixes
  * have quadratic buckets and the candidate join explodes (that corpus
  * defeats prefix filtering by construction; nothing defeats it short of
  * all-common elements). The realistic near-dup shape — and the one the
  * d22-vs-d08 guidance is about — is a Zipfian HEAD over a long rare
  * tail (V = 5M here): d08's Σ df² is dominated by the head it must
  * stoplist away, while prefixes hold only tail elements. Every 20th doc
  * is a planted ~90% clone of its predecessor so the verify path sees
  * true pairs (J ≈ 0.8 > τ).
  *
  * Run: `sbt "Test/runMain graft.tools.ZipfD22Probe [nDocs] [s]"`
  * (defaults 600000 docs, s = 1.1, V = 5e6, ~15-40 elements/doc,
  * tau = 3/5 — the d22 bench shape at 10× scale). */
object ZipfD22Probe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(600000)
    val zipfS = args.drop(1).headOption.map(_.toDouble).getOrElse(1.1)
    // the closed-form inverse-CDF exponent below is 1/(1-s): s = 1.0 would
    // divide by zero and emit NaN ranks silently (r14 advice) — fail at
    // parse time instead (s = 1 needs the log-form inverse CDF; use a
    // nearby value like 1.001 for the same shape)
    require(zipfS != 1.0, s"zipf s must not be exactly 1.0 (inverse-CDF " +
      "exponent 1/(1-s) is undefined there); use e.g. 1.001 or 0.999")
    val vocab = 5000000
    val (tauNum, tauDen) = (3, 5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      // mirror the bench session's r18 geometry pin (see Bench.scala) so
      // probe timings compare 1:1 whatever heap the probe JVM got
      .config("spark.buffer.pageSize",
        sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "8m"))
      .appName("zipf-d22-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // set table: ~15-40 raw draws per doc, Zipf(s) over ranks 1..V. Draws
    // are keyed by a doc's GENERATOR id `g` — every 20th doc clones its
    // predecessor's draws except ~10% of positions (keyed by its own id),
    // giving planted near-dup pairs with J ≈ 0.8 > τ. Pre-distincted so
    // the posting-pair census below sees the same sets the join does.
    def rankExpr(seed: String): String =
      s"""cast(least(cast($vocab as double),
         |  pow(1.0d + (cast(pmod(xxhash64($seed, i), 1000000000) as double) / 1e9d)
         |        * (pow(cast($vocab as double), ${1.0 - zipfS}d) - 1.0d),
         |      ${1.0 / (1.0 - zipfS)}d)) as long)""".stripMargin.replace("\n", " ")
    val sets = spark.range(nDocs).toDF("id")
      .withColumn("g", expr("if(id % 20 = 0 and id > 0, id - 1, id)"))
      // array_sort as well as array_distinct: assumeDistinct = true below
      // promises ASCENDING-SORTED distinct arrays since r17 (the verify
      // step is a sorted-merge count — unsorted input would silently
      // undercount; PrefixFilterOps scaladoc)
      .withColumn("hs_set", expr(
        s"""array_sort(array_distinct(transform(sequence(1, 15 + pmod(xxhash64(g, 77), 26)),
           |  i -> if(id <> g and pmod(xxhash64(id, i, 13), 10) = 0,
           |          ${rankExpr("id")}, ${rankExpr("g")}))))""".stripMargin.replace("\n", " ")))
      .select("id", "hs_set")
      .persist()
    val n = sets.count()
    val distinctElems = sets.select(explode(col("hs_set")).as("h")).agg(countDistinct("h")).head.getLong(0)
    println(s"corpus: $n docs, s=$zipfS, V=$vocab, distinct elements seen: $distinctElems")

    // d08's shape: every co-occurring element pair — Σ df·(df−1)/2 over
    // the FULL inverted index (what a direct join must generate before
    // any stoplist). A census, not an execution: at Zipfian head mass
    // actually materializing it is the point of failure.
    val posting = sets.select(col("id"), size(col("hs_set")).as("sz"), explode(col("hs_set")).as("h"))
    val postingPairs = posting.groupBy("h").agg(count(lit(1)).as("df"))
      .agg(sum(expr("df * (df - 1) DIV 2")).as("p")).head.getLong(0)
    println(s"posting_pairs (d08 pre-stoplist candidate space): $postingPairs")

    import graft.operators.PrefixFilterOps
    val prefix = PrefixFilterOps.prefixPostings(posting, tauNum, tauDen).persist()
    prefix.count()
    // candidates admitted by prefix + length alone vs the full shipped
    // condition (prefix + length + positional): the delta IS the
    // positional filter's cut on this corpus shape. Both predicates come
    // from the operator (r14 review: no private re-derivation)
    val prefixLenCond = PrefixFilterOps.prefixLengthCond(tauNum, tauDen)
    def countCand(cond: org.apache.spark.sql.Column): Long =
      prefix.as("a").join(prefix.as("b"), cond)
        .select(col("a.id"), col("b.id")).distinct().count()
    val t0 = System.nanoTime()
    val plPairs = countCand(prefixLenCond)
    val t1 = System.nanoTime()
    val posPairs = countCand(PrefixFilterOps.candidateCond(tauNum, tauDen))
    val t2 = System.nanoTime()
    println(f"prefix_length_pairs: $plPairs (distinct count in ${(t1 - t0) / 1e9}%.2f s)")
    println(f"positional_pairs:    $posPairs (distinct count in ${(t2 - t1) / 1e9}%.2f s)" +
      f" — positional cut: ${100.0 * (plPairs - posPairs) / math.max(plPairs, 1)}%.1f%%")

    // shipped operator end-to-end (3 reps, min): the number the
    // BUILD_NOTES corpus-shape table carries
    val walls = (0 until 3).map { _ =>
      val s0 = System.nanoTime()
      val truePairs = PrefixFilterOps.jaccardSelfJoin(
        sets, "id", "hs_set", tauNum, tauDen, assumeDistinct = true).count()
      val w = (System.nanoTime() - s0) / 1e9
      println(f"jaccardSelfJoin: $truePairs true pairs in $w%.2f s")
      w
    }
    println(f"d22 end-to-end min wall: ${walls.min}%.2f s")
    spark.stop()
  }
}
