"""Sequence packing for training-data assembly (q52).

Training pipelines concatenate documents into fixed-token-budget
sequences ("packing") so every training step sees a full context window.
The distributed-friendly deterministic variant implemented here is
offset packing: within each source, documents are laid out in stable
``doc_id`` order and a document belongs to the pack where its first
token lands (``pack_id = floor(preceding_token_count / budget)``).
Unlike greedy first-fit (inherently sequential), this is ONE window
cumsum — embarrassingly parallel per source partition — and is
reproducible across runs and cluster sizes.

Scale shape: a single hash shuffle on ``source`` for the window, then a
map-side-combinable aggregate on (source, pack_id).  At 100 TB, per-source
partitions can be bounded by packing per (source, date-shard) instead —
the pack key simply gains a column; no algorithm change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PACK_BUDGET = 256  # tokens per training sequence (model context length)


def q52_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, pack) manifest: how many docs land in each pack, the
    token payload, the doc-id span, and the fill ratio vs the budget.
    ``pack_tokens`` may exceed the budget when a document straddles a
    boundary (document-preserving packing: a doc is never split)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    w = Window.partitionBy("source").orderBy("doc_id")
    placed = (
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(PACK_BUDGET)),
        )
    )
    return placed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.round(F.sum("n_tokens") / F.lit(PACK_BUDGET), 3).alias("fill_ratio"),
    )


_Q52_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
  FROM t
)
SELECT source,
       CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       round(sum(n_tokens) / {PACK_BUDGET}, 3) AS fill_ratio
FROM c GROUP BY 1, 2
"""

PACKING_QUERIES = {"q52_pack_sequences": q52_pack_sequences}
PACKING_ORACLES = {"q52_pack_sequences": _Q52_SQL}
