package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (dev-only scratchpad, not part of the library API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import org.apache.spark.sql.graft.functions.token_shingle_hashes
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), token_shingle_hashes(col("text"), 3).as("sh")).persist()
    sh.count()
    val full = sh.select(col("doc_id").as("doc_b"), explode(col("sh")).as("e"), size(col("sh")).as("nb"))
    val pref = sh.select(col("doc_id").as("doc_a"),
      explode(slice(col("sh"), lit(1), (size(col("sh")) - ceil(size(col("sh")) * 0.5) + 1).cast("int"))).as("e"),
      size(col("sh")).as("na"))
    val joined = pref.join(full, "e").filter(col("doc_a") < col("doc_b"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label took ${(System.nanoTime() - t0) / 1e9}%s"); r
    }
    time("raw")(println("RAW_PAIRS=" + joined.count()))
    time("ratio")(println("RATIO_PAIRS=" + joined.filter(col("nb") <= col("na") * 2 && col("na") <= col("nb") * 2).count()))
    time("cand")(println("CAND=" + joined.select("doc_a", "doc_b").distinct().count()))
    spark.stop()
  }
}
