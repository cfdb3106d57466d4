package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 measurement harness (test-scope dev tool, not shipped surface):
  * reproduces the two load-bearing experiments whose numbers justify the
  * d18 and s11 designs —
  *   - d18: weighted-MinHash LSH banding over dense tf-cosine pairs MISSES
  *     true >=0.9 pairs (measured 17/42 at sf0.01 with 16x2 bands; 8x4 is
  *     worse) → d18 ships the blocked exact kernel instead of banding;
  *   - s11: nprobe/symmetry recall@5 sweep vs the exact s10 graph
  *     (base nprobe+symmetric ≈ 0.75 on the random fixture; doubling
  *     nprobe buys more than symmetrization alone).
  * Run with `sbt "Test/runMain graft.tools.ScratchD18S11"`. */
object ScratchD18S11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.QueryDsl._

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"=== $sf ===")
      import org.apache.spark.sql.graft.functions.{long_vec_dot, minhash_signature}
      val tf = tbl(spark, sf, "documents")
        .select(col("doc_id"), explode(filter(split(col("text"), " "),
          t => t =!= "")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val vocab = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), asc("term")).limit(4096)
        .collect().map(_.getString(0)).sorted.zipWithIndex.toMap
      val vSize = vocab.size
      val vocabCol = typedLit(vocab)
      val tfv = tf.filter(element_at(vocabCol, col("term")).isNotNull)
        .groupBy("doc_id")
        .agg(map_from_entries(collect_list(
          struct(element_at(vocabCol, col("term")).as("i"), col("tf")))).as("m"))
        .select(col("doc_id"),
          transform(sequence(lit(0), lit(vSize - 1)),
            i => coalesce(element_at(col("m"), i), lit(0L))).as("tfv"))
        .withColumn("n2", long_vec_dot(col("tfv"), col("tfv")))
        .persist()
      val a = tfv.select(col("doc_id").as("doc_a"), col("tfv").as("v_a"), col("n2").as("n2_a"))
      val b = tfv.select(col("doc_id").as("doc_b"), col("tfv").as("v_b"), col("n2").as("n2_b"))
      val truth = a.join(broadcast(b), col("doc_a") < col("doc_b"))
        .withColumn("dot", long_vec_dot(col("v_a"), col("v_b")))
        .filter(lit(100) * col("dot") * col("dot") >= lit(81) * col("n2_a") * col("n2_b"))
        .select("doc_a", "doc_b").persist()
      println(s"d18 truth pairs: ${truth.count()}")

      // weighted MinHash over the expanded multiset {(term, 1..tf)}
      val wsh = tf.select(col("doc_id"), col("term"),
          explode(sequence(lit(1L), col("tf"))).as("k"))
        .select(col("doc_id"), xxhash64(col("term"), col("k")).as("e"))
        .groupBy("doc_id").agg(collect_list(col("e")).as("sh"))
        .select(col("doc_id"), minhash_signature(col("sh"), 32).as("sig"))
        .persist()
      for ((bands, rpb) <- Seq((16, 2), (8, 4))) {
        val bd = wsh.select(col("doc_id"), posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            bb => xxhash64(slice(col("sig"), bb * lit(rpb) + 1, lit(rpb)), bb))))
          .withColumnsRenamed(Map("pos" -> "band_id", "col" -> "band_hash"))
        val cand = bd.withColumnsRenamed(Map("doc_id" -> "doc_a"))
          .join(bd.withColumnsRenamed(Map("doc_id" -> "doc_b")), Seq("band_id", "band_hash"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct().persist()
        val miss = truth.join(cand, Seq("doc_a", "doc_b"), "left_anti").count()
        println(s"d18 weighted-minhash ${bands}x$rpb candidates: ${cand.count()}, missed: $miss")
        cand.unpersist()
      }
      wsh.unpersist()

      // ---- s11 recall variants ----
      import graft.queries.SimilarityQueries
      val exact = graft.SparkEntry.queries("s10_knn_graph")(spark, sf)
        .select(col("query_id"), col("neighbor_id")).persist()
      val nAll = exact.count()
      val pivots = SimilarityQueries.ivfPivots(spark, sf)
      val assigned = SimilarityQueries.ivfAssigned(spark, sf).persist()
      import org.apache.spark.sql.graft.functions.top_k_struct
      def boundedGraph(nprobe: Int, symmetric: Boolean): DataFrame = {
        val probes = tbl(spark, sf, "embeddings")
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            explode(SimilarityQueries.topPivotIds(pivots, col("embedding"), nprobe)).as("pivot_id"))
        val fwd = assigned.join(probes, "pivot_id")
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            org.apache.spark.sql.graft.functions.vec_cosine(col("q_emb"), col("embedding")).as("score"))
        val cand = if (!symmetric) fwd else
          fwd.unionAll(fwd.select(col("neighbor_id").as("query_id"),
            col("query_id").as("neighbor_id"), col("score"))).distinct()
        cand.groupBy("query_id")
          .agg(top_k_struct(struct(
            (col("score") * -1).as("neg_score"), col("neighbor_id")), 5).as("top"))
          .select(col("query_id"), posexplode(col("top")))
          .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"))
      }
      val base = SimilarityQueries.nprobeFor(pivots.length)
      for ((np, sym) <- Seq((base, true), (2 * base, false), (2 * base, true))) {
        val g = boundedGraph(np, sym)
        val hit = exact.join(g, Seq("query_id", "neighbor_id")).count()
        println(s"s11 nprobe=$np sym=$sym recall@5: $hit / $nAll = ${hit.toDouble / nAll}")
      }
      truth.unpersist(); tfv.unpersist(); exact.unpersist(); assigned.unpersist()
      graft.queries.DedupQueries.releaseShared()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
