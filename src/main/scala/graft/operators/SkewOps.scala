package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for heavy-hitter keys.
  *
  * Spark's partial aggregation already handles skewed count/sum — these cover
  * the cases it can't: joins against a skewed key distribution, and
  * buffer-building aggregations (collect_set) where one key's buffer would
  * blow a single task.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) is the first line
  * of defense; explicit salting is for when the skew is known ahead of time
  * or the join is not a sort-merge join AQE can split.
  */
object SkewOps {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, buckets); the small side is replicated `buckets` times. The join key
    * becomes (key, salt), so one hot key spreads over `buckets` tasks.
    * Row-content-derived salt keeps the result deterministic. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(buckets)).cast("int"))
    val expandedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(expandedSmall,
        saltedBig(bigKey) === expandedSmall(smallKey) &&
          saltedBig("__salt") === expandedSmall("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Salted collect_set: builds per-(key, salt) partial sets, then merges —
    * no single task ever materializes a hot key's full set alone. */
  def saltedCollectSet(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int): DataFrame = {
    df.withColumn("__salt",
        pmod(xxhash64(col(valueCol)), lit(buckets)).cast("int"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__partial"))))).as(s"${valueCol}_set"))
  }

  /** Top-k heavy hitters per key space — the diagnostic used to decide
    * whether salting is needed at all. */
  def keyHistogram(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc(keyCol))
      .limit(topK)
}
