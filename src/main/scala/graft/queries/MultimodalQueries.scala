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
    "m02_frame_sample" -> """
      SELECT media_id, n_frames,
             UNNEST(GENERATE_SERIES(0, n_frames - 1, 4)) AS frame_id,
             md5(media_id || ':' || UNNEST(GENERATE_SERIES(0, n_frames - 1, 4))) AS frame_sig
      FROM (SELECT doc_id AS media_id,
                   OCTET_LENGTH(ENCODE(text)) // 100 + 1 AS n_frames
            FROM documents)"""
  )
}
