"""Multimodal column plumbing — binary payloads with typed metadata.

Images / audio / video are opaque ``binary`` columns plus a typed metadata
struct; per-item decode / feature-extraction runs as an Arrow-batched
``mapInPandas`` stage (the idiomatic shape for CPU-bound per-item Python
work: vectorized transfer, per-partition execution, no driver loop).

The decode step for real media is STUBBED (the container has no image /
audio libraries): ``decode_image`` raises ``NotImplementedError`` and the
query path uses a deterministic byte-level feature extractor instead.  The
Spark-side plumbing — binary column, metadata struct, batch iterator
signature, partition-preserving schema — is real and oracle-checked.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
    ]
)


def decode_image(content: bytes) -> "object":
    """Decode an image payload into pixels.

    STUB: no imaging library is available in this container.  The Spark
    plumbing around it (binary column → mapInPandas batches) is real; swap
    this function for PIL/torchvision in a real deployment.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; see ext.multimodal docstring"
    )


def to_media_table(docs: DataFrame) -> DataFrame:
    """documents → media table: opaque binary ``content`` + metadata
    struct.  At scale this is the storage schema for image/audio shards:
    payload stays opaque to the optimizer, metadata columns stay
    filterable/prunable (predicate pushdown works on ``meta.*``)."""
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )  # a NULL payload has no bytes to decode — dropped at the source


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched per-item feature extraction over binary payloads.

    Deterministic byte-level features (size, md5 digest) stand in for the
    stubbed media decode; the batch iterator shape is exactly what a real
    decoder would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "n_bytes": content.map(len).astype("int64"),
                    "digest": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.select("doc_id", "source", "content").mapInPandas(
        batches, FEATURE_SCHEMA
    )


def q31_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(to_media_table(docs))
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct(F.col("digest")).alias("n_distinct_digests"),
        F.min("digest").alias("min_digest"),
    )


_Q31_SQL = """
SELECT source, count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS n_distinct_digests,
       min(md5(text)) AS min_digest
FROM documents WHERE text IS NOT NULL GROUP BY source
"""


# ---------------------------------------------------------------------------
# resize: per-item payload transformation (decode → resize → re-encode)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("resized", T.BooleanType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _fake_resize(b: bytes, target: int) -> bytes:
    """Deterministic stand-in for decode→resize→encode (no imaging libs in
    this container): uniform byte subsample down to ``target`` bytes.  The
    plumbing (binary in, smaller binary out, metadata updated) is what a
    real PIL/libvips resize stage would do."""
    if len(b) <= target:
        return b
    step = len(b) / target
    return bytes(b[int(i * step)] for i in range(target))


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Arrow-batched payload resize: one mapInPandas stage, partition-
    preserving, output schema carries refreshed metadata.  At 100 TB this
    is the canonical shape for bulk media transcode — CPU work rides the
    scan partitions, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["content"].map(
                lambda b: _fake_resize(bytes(b), target_bytes)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "content": resized,
                    "meta": [
                        {
                            "mime": "application/octet-stream",
                            "n_bytes": len(b),
                            "resized": True,
                        }
                        for b in resized
                    ],
                }
            )

    return media.select("doc_id", "source", "content").mapInPandas(
        batches, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# frame sampling: one input payload → many frame rows
# ---------------------------------------------------------------------------

FRAME_BYTES = 64
FRAME_EVERY = 4

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_EVERY,
) -> DataFrame:
    """Treat each payload as a fixed-size-frame stream and emit every
    ``every``-th frame as its own row — the mapInPandas fan-out shape a
    real video frame sampler uses (one input row → many output rows, no
    explode of a materialized array: frames are cut inside the Arrow
    batch, so peak memory is one batch, not one decoded video)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, srcs, idxs, frames = [], [], [], []
            for doc_id, source, content in zip(
                pdf["doc_id"], pdf["source"], pdf["content"]
            ):
                b = bytes(content)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for j in range(0, n_frames, every):
                    ids.append(int(doc_id))
                    srcs.append(source)
                    idxs.append(j)
                    frames.append(b[j * frame_bytes : (j + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "source": srcs,
                    "frame_idx": pd.array(idxs, dtype="int64"),
                    "frame": frames,
                }
            )

    return media.select("doc_id", "source", "content").mapInPandas(
        batches, FRAMES_SCHEMA
    )


def q34_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing, oracle-checked by pure arithmetic: every
    4th 64-byte frame of each payload; per source, sampled frame count and
    total sampled bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = sample_frames(to_media_table(docs))
    return frames.groupBy("source").agg(
        F.count(F.lit(1)).alias("sampled_frames"),
        F.sum(F.length("frame")).cast("long").alias("sampled_bytes"),
    )


_Q34_SQL = f"""
WITH d AS (
  SELECT doc_id, source, octet_length(encode(text)) AS n
  FROM documents WHERE text IS NOT NULL
),
f AS (
  SELECT source, n, unnest(range(0, CAST((n + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS BIGINT))) AS j
  FROM d
),
s AS (
  SELECT source, least({FRAME_BYTES}, n - {FRAME_BYTES} * j) AS fb
  FROM f WHERE j % {FRAME_EVERY} = 0
)
SELECT source, count(*) AS sampled_frames, CAST(sum(fb) AS BIGINT) AS sampled_bytes
FROM s GROUP BY source
"""


MULTIMODAL_QUERIES = {
    "q31_multimodal_features": q31_multimodal_features,
    "q34_frame_sample": q34_frame_sample,
}
MULTIMODAL_ORACLES = {
    "q31_multimodal_features": _Q31_SQL,
    "q34_frame_sample": _Q34_SQL,
}
