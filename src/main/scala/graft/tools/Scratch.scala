package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-18s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    import graft.queries.QueryDsl._
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val shingles = when(size(toks) < 3, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
    val sh = tbl(spark, dir, "documents")
      .select(col("doc_id"), array_sort(array_distinct(transform(shingles, s => xxhash64(s)))).as("sh"))
      .persist()
    time("materialize sh")(sh.count())
    val prefix = sh.select(col("doc_id"),
      explode(slice(col("sh"), lit(1), floor(size(col("sh")) * lit(0.7)).cast("int") + 1)).as("ph"))
    time("prefix count")(prefix.count())
    val cand = prefix.withColumnsRenamed(Map("doc_id" -> "doc_a"))
      .join(prefix.withColumnsRenamed(Map("doc_id" -> "doc_b")), "ph")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    time("cand count")(cand.count())
    val verified = cand
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_a", "sh" -> "sh_a")), "doc_a")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_b", "sh" -> "sh_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("n_union", size(col("sh_a")) + size(col("sh_b")) - col("n_inter"))
      .withColumn("jaccard_milli", expr("(1000L * n_inter) DIV n_union"))
      .filter(col("jaccard_milli") >= 300)
    time("verify count")(verified.count())
    spark.stop()
  }
}
