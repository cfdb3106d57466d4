package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (hash-seeded); everything Spark-side —
  * schema, binary handling, batch shape, partition-parallel feature
  * extraction via mapPartitions — is real and tested. On a real cluster the
  * fake decoder body is the only thing to swap for (e.g.) a JNI codec.
  */
object MultimodalQueries {
  import QueryDsl._

  /** documents.text re-materialized as a binary "media" payload + metadata —
    * stands in for an image/audio blob column at 100 TB. */
  private def mediaTable(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"),
        col("source"), col("n_chars"))

  val defs: Map[String, Q] = Map(
    "m01_binary_meta" -> ((s, dir) => {
      // byte length + content digest: the standard "media inventory" scan
      mediaTable(s, dir)
        .select(col("media_id"),
          length(col("content")).as("n_bytes"),
          sha2(col("content"), 256).as("sha256"),
          col("source"))
    }),

    "m02_frame_sample" -> ((s, dir) => {
      // STUB decode: pretend each 100-byte block is a "frame"; sample every
      // 4th frame and emit a per-frame fingerprint (deterministic fake of a
      // frame-level feature; md5 of "id:frame" for oracle parity). Real impl
      // would decode via codec per frame.
      mediaTable(s, dir)
        .withColumn("n_frames", (length(col("content")).cast("long") / 100L).cast("long") + 1)
        .select(col("media_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_id"))
        .withColumn("frame_sig", md5(concat_ws(":", col("media_id"), col("frame_id"))))
    }),

    "m03_feature_extract" -> ((s, dir) => {
      // partition-parallel feature extraction with the batch shape a real
      // encoder would use: mapPartitions over (id, bytes) → (id, float[8]).
      // STUB: features are a seeded hash of the payload, not a real model.
      val schema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("feat", ArrayType(FloatType, containsNull = false), nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val out = mediaTable(s, dir).select("media_id", "content")
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            // deterministic fake "embedding": folded byte sums per lane
            val feat = Array.tabulate(8) { lane =>
              var acc = 1469598103934665603L ^ (id * 31 + lane)
              var i = lane
              while (i < bytes.length) { acc = acc * 1099511628211L + bytes(i); i += 8 }
              (acc % 1000L).toFloat / 1000.0f
            }
            Row(id, feat)
          }
        }(enc)
      out.select(col("media_id"), round(element_at(col("feat"), 1) * 1000, 0).cast("long").as("f0_milli"),
        size(col("feat")).as("n_dims"))
    }),

    "m04_chunk_freq" -> ((s, dir) => {
      // fixed-size chunk frequency table over binary payloads — the
      // storage-dedup sizing report (how much content is shared verbatim
      // across media). Every 64-byte block is hashed; the shuffle carries
      // only (hash, partial counts). Fixed chunking is the oracle-exact
      // BASELINE here; its known weakness — one inserted byte destroys all
      // downstream alignment — is what m05's content-defined chunking
      // fixes (ExpressionsSpec proves the re-alignment property).
      val chunked = mediaTable(s, dir)
        .select(col("media_id"),
          // greatest(.., 0): Spark's sequence DESCENDS when start > stop, so
          // an empty payload would otherwise yield [0, -1] — two chunks
          posexplode(expr(
            "transform(sequence(0, greatest(CAST(ceil(length(content)/64.0) AS INT) - 1, 0))," +
              " i -> substring(content, i*64 + 1, 64))")))
        .select(col("media_id"), md5(col("col")).as("chunk_md5"))
      chunked.groupBy("chunk_md5")
        .agg(countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_occurrences"))
    }),

    "m05_cdc_chunk_dedup" -> ((s, dir) => {
      // content-defined chunking (native CdcChunkHashes expression, gear
      // rolling hash, ~80-byte expected chunks): shared-chunk pairs across
      // media SURVIVE byte insertions because boundaries re-align — the
      // production dedup primitive for crawl snapshots / media archives.
      // Rows-only (no CDC in DuckDB); ExpressionsSpec pins determinism,
      // boundary re-alignment after a prefix edit, and that CDC shares
      // chunks where fixed chunking shares none.
      import org.apache.spark.sql.graft.functions.cdc_chunk_hashes
      val chunks = mediaTable(s, dir)
        .select(col("media_id"), explode(cdc_chunk_hashes(col("content"))).as("chunk"))
      chunks.groupBy("chunk")
        .agg(countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_media") >= 2)
        .agg(count(lit(1)).as("n_shared_chunks"),
          coalesce(sum(col("n_occurrences")), lit(0L)).as("n_shared_occurrences"),
          coalesce(max(col("n_media")), lit(0L)).cast("long").as("max_spread"))
    })
  )

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" -> """
      SELECT doc_id AS media_id,
             CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
             SHA256(text) AS sha256,
             source
      FROM documents""",

    // m03 stays rows-only: its features come from a JVM-side stub encoder
    // (mapPartitions), deliberately not expressible in SQL.
    // m05 stays rows-only: content-defined chunk boundaries come from the
    // native gear-rolling-hash expression, not expressible in DuckDB SQL.

    // byte chunks equal character chunks because the fixture is ASCII —
    // the same equivalence m01's sha256(text) oracle already relies on
    "m04_chunk_freq" -> """
      SELECT chunk_md5,
             CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
             COUNT(*) AS n_occurrences
      FROM (
        SELECT d.doc_id AS media_id,
               md5(SUBSTRING(d.text, t.i * 64 + 1, 64)) AS chunk_md5
        FROM documents d,
             UNNEST(GENERATE_SERIES(0,
               GREATEST(CAST(CEIL(OCTET_LENGTH(ENCODE(d.text)) / 64.0) AS INT) - 1, 0))) AS t(i))
      GROUP BY chunk_md5""",

    "m02_frame_sample" -> """
      SELECT media_id, n_frames,
             UNNEST(GENERATE_SERIES(0, n_frames - 1, 4)) AS frame_id,
             md5(media_id || ':' || UNNEST(GENERATE_SERIES(0, n_frames - 1, 4))) AS frame_sig
      FROM (SELECT doc_id AS media_id,
                   OCTET_LENGTH(ENCODE(text)) // 100 + 1 AS n_frames
            FROM documents)"""
  )
}
