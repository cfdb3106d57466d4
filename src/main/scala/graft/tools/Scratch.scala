package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[t] $name%-14s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("d01 run1")(graft.SparkEntry.queries("d01_dedup_exact")(spark, dir).count())
    time("d01 run2")(graft.SparkEntry.queries("d01_dedup_exact")(spark, dir).count())
    time("docs scan")(spark.read.parquet(s"$dir/documents.parquet").count())
    time("d02 run1")(graft.SparkEntry.queries("d02_dedup_norm")(spark, dir).count())
    time("d03 run1")(graft.SparkEntry.queries("d03_minhash_lsh")(spark, dir).count())
    time("d03 run2")(graft.SparkEntry.queries("d03_minhash_lsh")(spark, dir).count())
    spark.stop()
  }
}
