"""Multimodal (binary) column plumbing (SURVEY §2.E12).

Treat image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` kernels. The
codec itself is STUBBED (no image/audio libs in this container): the
"decode" derives deterministic pseudo-features from the raw bytes, so
the Spark-side plumbing — schema, batch shape, partition behavior —
is real and oracle-checkable, while a real decoder (PIL/ffmpeg) can
replace ``_decode_stub`` without touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image/video decoder.

    Replace with a real codec (e.g. PIL.Image.open(BytesIO(payload)))
    in a container that ships one; the mapInPandas contract stays.
    """
    n = len(payload)
    return n, n % 640, (n * 7) % 480, n % 16 + 1


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: UTF-8 bytes as the opaque payload +
    a typed metadata struct (the shape a real ingest would produce)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("media_lang"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("media_meta"),
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode: one output row per payload.

    mapInPandas streams record batches — payload bytes never
    materialise on the driver, and batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(b) for b in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "fake_width", "fake_height", "n_frames"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(decode, schema=DECODED_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_feature", T.DoubleType()),
    ]
)
MAX_SAMPLED_FRAMES = 4


def sample_frames(binary_df: DataFrame) -> DataFrame:
    """Uniform-stride frame sampling — the N:M mapInPandas shape (one
    input media row fans out to up to ``MAX_SAMPLED_FRAMES`` frame
    rows; batch sizes in and out differ, which is exactly what a real
    video sampler produces).

    The frame DECODE is the deterministic stub (pure int64 arithmetic
    on (doc_id, frame_index)), so the fan-out plumbing is fully
    oracle-checkable; a real ffmpeg-style sampler replaces the feature
    line without touching schema or partitioning.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, nfs, feats = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) % 16 + 1
                k = min(MAX_SAMPLED_FRAMES, n_frames)
                stride = max(n_frames // k, 1)
                for i in range(k):
                    idx = i * stride
                    if idx >= n_frames:
                        break
                    ids.append(doc_id)
                    idxs.append(idx)
                    nfs.append(n_frames)
                    feats.append(
                        ((doc_id * 31 + idx) * 2654435761) % 1000003
                        / 1000003.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "frame_feature": pd.Series(feats, dtype="float64"),
                }
            )

    return binary_df.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)
