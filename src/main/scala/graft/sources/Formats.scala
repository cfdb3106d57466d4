package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink format helpers. Query execution is delegated to Spark's
  * readers/writers (same stance as the reference — SURVEY §2.2 "scans/
  * sources"); this module standardizes the options that matter at scale.
  */
object Formats {

  /** Scale-sane defaults per format:
    *   - parquet: snappy, dictionary on — the analytics default;
    *   - orc: zlib (better ratio for archival copies);
    *   - csv/json: header + explicit nullValue so round-trips are lossless
    *     for the types they can carry (csv/json drop type fidelity by
    *     nature — read back with an explicit schema, never inference, at
    *     fleet scale).
    */
  def write(df: DataFrame, path: String, format: String): Unit = format match {
    case "parquet" =>
      df.write.mode("overwrite").option("compression", "snappy").parquet(path)
    case "orc" =>
      df.write.mode("overwrite").option("compression", "zlib").orc(path)
    case "csv" =>
      df.write.mode("overwrite").option("header", "true")
        .option("nullValue", "\\N").csv(path)
    case "json" =>
      df.write.mode("overwrite").option("compression", "gzip").json(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  /** Schema-explicit read (no inference jobs — an inference pass over 100 TB
    * is a full extra scan). */
  def read(spark: SparkSession, path: String, format: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = format match {
    case "parquet" => spark.read.schema(schema).parquet(path)
    case "orc" => spark.read.schema(schema).orc(path)
    case "csv" => spark.read.schema(schema)
      .option("header", "true").option("nullValue", "\\N").csv(path)
    case "json" => spark.read.schema(schema).json(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }
}
