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
    return docs.select(
        "doc_id",
        "source",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


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
FROM documents GROUP BY source
"""


MULTIMODAL_QUERIES = {"q31_multimodal_features": q31_multimodal_features}
MULTIMODAL_ORACLES = {"q31_multimodal_features": _Q31_SQL}
