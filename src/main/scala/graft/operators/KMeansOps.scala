package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.functions.vec_cosine

/** Spherical k-means over a float-vector column, built entirely from
  * DataFrame ops + the native cosine expression — the "trained centroids"
  * upgrade over modulo-pivot IVF.
  *
  * Scale design:
  *   - assignment is a broadcast crossJoin against k centroids (k rows!) —
  *     one map-side pass over the corpus per iteration, no shuffle of
  *     vectors; the only shuffle is the (cluster, pos, component) partial-sum
  *     aggregation for the update step;
  *   - centroids are collected to the driver between iterations (k×dim
  *     floats — tiny) and re-broadcast, so the logical plan stays flat
  *     instead of growing per iteration;
  *   - determinism: seeded init (vec_id % k), fixed iteration count,
  *     decimal-sum centroid accumulation (partition-order independent),
  *     cosine ties broken by cluster id.
  */
object KMeansOps {

  /** Returns (assignments: id, cluster, sim; centroids: cluster, c_vec). */
  def sphericalKMeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window

    // the working set is scanned once per iteration for assignment and once
    // for the update — materialize it
    val data = df.select(col(idCol), col(vecCol)).persist()

    def assignTo(centroids: DataFrame): DataFrame = {
      val w = Window.partitionBy(idCol).orderBy(desc("sim"), asc("cluster"))
      data
        .crossJoin(broadcast(centroids))
        .select(col(idCol), col(vecCol), col("cluster"),
          vec_cosine(col(vecCol), col("c_vec")).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
    }

    // deterministic init: centroid c = the lowest-id vector with id % k == c
    val wInit = Window.partitionBy("cluster").orderBy(idCol)
    var centroids = data
      .select((col(idCol) % k).cast("int").as("cluster"), col(idCol), col(vecCol).as("c_vec"))
      .withColumn("rn", row_number().over(wInit))
      .filter(col("rn") === 1)
      .select("cluster", "c_vec")

    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assignTo(centroids)
      // update: per-(cluster, dim) decimal mean → new centroid vector
      val means = assigned
        .select(col("cluster"), posexplode(col(vecCol)))
        .groupBy("cluster", "pos")
        .agg((sum(col("col").cast("decimal(27,10)")) / count(lit(1))).as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("cluster"),
          expr("transform(dims, d -> CAST(d.m AS FLOAT))").as("c_vec"))
      // collect k tiny rows; re-broadcast as a flat literal frame
      val rows = means.collect().toSeq
      centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r.getInt(0), r.getSeq[Float](1))), 1),
        means.schema)
    }
    (assignTo(centroids).drop(vecCol), centroids)
  }
}
