package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory is assembled from per-domain modules:
  *   - [[graft.queries.CoreQueries]]       TPC-H-ish SQL surface (SURVEY §2.2)
  *   - [[graft.queries.TextQueries]]       text analysis (tokens, quality, lang-ID)
  *   - [[graft.queries.DedupQueries]]      exact / MinHash-LSH / SimHash dedup
  *   - [[graft.queries.SimilarityQueries]] ANN over embeddings
  *   - [[graft.queries.MultimodalQueries]] binary media columns + stub decode
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ MultimodalQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (MinHash/SimHash signatures, float similarity scores) → the driver
    * records a weaker rows-only check for those. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles
}
