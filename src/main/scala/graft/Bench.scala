package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first timed query doesn't absorb
    // executor-pool startup, file-index listing, or first-job codegen costs
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("documents", "lineitem", "orders", "events", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => }
    }
    // two passes, report the min per query: pass 1 absorbs per-plan codegen
    // and JIT compilation, so pass 2 measures steady-state execution — the
    // regime a long-lived cluster session actually runs in
    // optional comma-separated name-prefix filter for focused timing runs
    // (e.g. SPARK_GRAFT_ONLY=d08,d09); absent = full inventory
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    def runAll(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
        .map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          name -> (System.nanoTime() - t0) / 1e9
        }.toMap
    val first = runAll()
    // drop caches persisted by pass 1 (shingle/signature/pair tables): the
    // min must measure re-execution with warm JIT, not cache scans.
    // releaseShared clears the dedup registry too, so pass 2 rebuilds and
    // re-persists instead of silently reusing unpersisted instances
    graft.queries.DedupQueries.releaseShared()
    spark.catalog.clearCache()
    val second = runAll()
    val results = first.map { case (k, v) => k -> math.min(v, second.getOrElse(k, v)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
