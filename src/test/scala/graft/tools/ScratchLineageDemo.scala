package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft._
import org.apache.spark.sql.graft.implicits._

/** Demo "user program" driving the lineage library's public surface. */
object ScratchLineageDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    println("=== dot (contracted) ===")
    println(df.printAsSQLFlow(contracted = true))

    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders_v")
    spark.sql("SELECT o_custkey, count(*) AS n FROM orders_v GROUP BY o_custkey")
      .createOrReplaceTempView("cust_counts")
    println("=== catalog (mermaid) ===")
    println(SQLFlow.printAsSQLFlow(spark, graphFormat = MermaidSink()))

    df.saveAsSQLFlow(Map("outputDirPath" -> "/tmp/flow_demo", "overwrite" -> "true"))
    df.saveAsSQLFlow(Map("outputDirPath" -> "/tmp/flow_demo_cy", "overwrite" -> "true"),
      graphSink = CypherFileSink())
    println("saved dot + cypher under /tmp/flow_demo*")
    spark.stop()
  }
}
