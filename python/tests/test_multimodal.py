"""Multimodal mapInPandas plumbing (builder mandate).

Media ride as opaque BINARY columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Pandas UDFs over
`mapInPandas`. The decode step is a DETERMINISTIC STUB (the image/audio
codec libraries are not in this container — the mandate's explicit
carve-out); everything Spark-side is real and tested here: the output
schema contract, the Iterator[pd.DataFrame] batch signature, per-row
fan-out, partition-locality (no shuffle), and cross-run determinism.
The JVM-side m-series (m03 real PNG decode, m11 patch tiling) carries the
exact-oracle story; this module carries the Python-pipeline surface a
production multimodal ingest would deploy.
"""

import hashlib
import unittest

from pyspark.sql import functions as f
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from tests.testutils import ReusedSQLTestCase

SF = "/root/testdata/sf0.001"

FEAT_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("feat_mean_milli", LongType(), False),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_id", LongType(), False),
    StructField("frame_bytes", LongType(), False),
])


def stub_decode_features(batches):
    """Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]: the feature
    extractor. The 'decode' is a deterministic fake (md5-derived feature,
    dims from the id) standing in for a codec + model forward pass; the
    batch loop, column access, and schema discipline are the real
    production shape."""
    import pandas as pd

    for pdf in batches:
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "n_bytes": pdf["content"].map(len).astype("int64"),
            "width": (4 + pdf["media_id"] % 13).astype("int32"),
            "height": (3 + pdf["media_id"] % 11).astype("int32"),
            "feat_mean_milli": pdf["content"].map(
                lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:6], 16) % 256000
            ).astype("int64"),
        })


def stub_frame_sample(batches):
    """Fan-out shape: every 4th 100-byte block becomes a 'frame' row —
    one input row yields many output rows (m02's sampling rule)."""
    import pandas as pd

    for pdf in batches:
        out = {"media_id": [], "frame_id": [], "frame_bytes": []}
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            raw = bytes(content)
            n_frames = len(raw) // 100 + 1
            for fid in range(0, n_frames, 4):
                out["media_id"].append(mid)
                out["frame_id"].append(fid)
                out["frame_bytes"].append(len(raw[fid * 100:(fid + 1) * 100]))
        yield pd.DataFrame(out, dtype="int64")


class MultimodalPandasTests(ReusedSQLTestCase):

    def _media(self):
        return (
            self.spark.read.parquet(f"{SF}/documents.parquet")
            .select(
                f.col("doc_id").alias("media_id"),
                f.encode("text", "utf-8").alias("content"),
            )
        )

    def test_feature_extract_schema_contract_and_determinism(self):
        out = self._media().mapInPandas(stub_decode_features, schema=FEAT_SCHEMA)
        self.assertEqual(out.schema, FEAT_SCHEMA)
        rows = {r.media_id: r for r in out.collect()}
        self.assertEqual(len(rows), 500)
        # dims follow the typed-metadata rule, features are deterministic
        again = {r.media_id: r for r in
                 self._media().mapInPandas(stub_decode_features, schema=FEAT_SCHEMA).collect()}
        self.assertEqual(rows, again)
        for mid, r in rows.items():
            self.assertEqual(r.width, 4 + mid % 13)
            self.assertEqual(r.height, 3 + mid % 11)
            self.assertGreater(r.n_bytes, 0)

    def test_frame_sample_fanout_matches_closed_form(self):
        out = self.spark.createDataFrame(
            self._media().mapInPandas(stub_frame_sample, schema=FRAME_SCHEMA).collect(),
            FRAME_SCHEMA,
        )
        expected = (
            self._media()
            .select(
                f.col("media_id"),
                ((f.length("content").cast("long") / 100).cast("long") + 1).alias("n_frames"),
            )
            .select(f.col("media_id"), f.explode(
                f.sequence(f.lit(0), f.col("n_frames") - 1, f.lit(4))).alias("frame_id"))
        )
        self.assertEqual(out.count(), expected.count())
        self.assertEqual(
            out.select("media_id", "frame_id").exceptAll(expected).count(), 0)

    def test_map_in_pandas_is_partition_local(self):
        # the whole point of the batch shape: no exchange — repartition the
        # media 7 ways, and the mapped output must still be 7 partitions
        # with no shuffle node in the plan
        src = self._media().repartition(7)
        out = src.mapInPandas(stub_decode_features, schema=FEAT_SCHEMA)
        self.assertEqual(out.rdd.getNumPartitions(), 7)
        plan = out._jdf.queryExecution().executedPlan().toString()
        before, sep, after = plan.partition("MapInPandas")
        self.assertTrue(sep, f"expected MapInPandas in:\n{plan}")
        # the single Exchange is the repartition BELOW the UDF, never above
        self.assertNotIn("Exchange", before)

    def test_resize_stage_composes_map_side(self):
        # 'resize' = a second mapInPandas stage over the first one's output
        # (decode -> features -> resize/normalize): still one stage, no
        # shuffle between them
        def normalize(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["feat_mean_milli"] = pdf["feat_mean_milli"] % 1000
                yield pdf

        out = (
            self._media()
            .mapInPandas(stub_decode_features, schema=FEAT_SCHEMA)
            .mapInPandas(normalize, schema=FEAT_SCHEMA)
        )
        self.assertEqual(out.count(), 500)
        self.assertTrue(all(0 <= r.feat_mean_milli < 1000 for r in out.collect()))
        plan = out._jdf.queryExecution().executedPlan().toString()
        self.assertEqual(plan.count("MapInPandas"), 2)
        self.assertNotIn("Exchange hashpartitioning", plan)


if __name__ == "__main__":
    unittest.main()
