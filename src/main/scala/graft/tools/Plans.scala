package graft.tools
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_filter_project", "q03_shipping_priority",
      "q05_local_supplier", "q20_left_join_agg", "s01_knn_brute")
    names.foreach { n =>
      println(s"########## $n ##########")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
