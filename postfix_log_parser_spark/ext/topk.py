"""Two-phase distributed top-k per key — map-side combine for windows.

The naive per-key top-k (`row_number() OVER (PARTITION BY key ORDER BY
ord)` then `rn <= k`) shuffles and sorts EVERY input row.  At 100 TB
that exchange is the job.  But top-k is a mergeable aggregate: the
global top-k per key is a function of each map partition's local top-k
per key, so rows beyond rank k inside any partition can be dropped
before the exchange — the same reason partial_count exists for counts.
Spark has no built-in partial phase for window ranks, so phase 1 here is
an Arrow-batched ``mapInPandas`` that keeps a running per-key top-k
across the partition's record batches (bounded memory: k rows per key
seen by the partition), and phase 2 is the ordinary window over the
pre-trimmed remainder — at most k × n_partitions rows per key.

On uniformly distributed keys the exchange shrinks by ~|rows| / (k ×
partitions); on SKEWED keys it is the difference between one hot
reducer sorting a hot key's entire history and sorting k × partitions
rows.  The final window is exact because phase 1 never drops a row that
could be in the global top-k (local rank ≤ k is necessary for global
rank ≤ k).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOPK_K = 3


def partial_topk(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str | None,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Rows of ``df`` trimmed to each partition's local top-k per key
    under (order_col DESC|ASC, tiebreak ASC) — phase 1 of two-phase
    top-k (``ascending=True`` gives bottom-k, e.g. KMV sketch builds).
    Exact containment: any row in the global top-k is in its
    partition's local top-k, so the follow-up window sees every
    candidate.  Null order values are dropped (they cannot rank)."""
    schema = df.schema
    cols = [key, order_col] + ([tiebreak] if tiebreak else [])
    asc = [True, ascending] + ([True] if tiebreak else [])

    def _trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: pd.DataFrame | None = None
        for pdf in batches:
            pdf = pdf[pdf[order_col].notna()]
            pool = pdf if state is None else pd.concat([state, pdf])
            pool = pool.sort_values(cols, ascending=asc, kind="mergesort")
            # dropna=False: a NULL key is a legitimate group (SQL window
            # semantics put all NULL keys in one partition)
            state = pool.groupby(key, sort=False, dropna=False).head(k)
        if state is not None and len(state):
            yield state

    return df.mapInPandas(_trim, schema)


def q138_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user via two-phase top-k.

    Phase 1 trims each scan partition to its local top-3 per user with
    NO exchange; the single user-keyed exchange then carries at most
    3 × partitions rows per user into the exact final window.  Output
    matches the plain window query row-for-row (the DuckDB oracle IS
    the naive window form)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "value"
    )
    trimmed = partial_topk(ev, "user_id", "value", "event_id", TOPK_K)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc_nulls_last(), F.col("event_id").asc()
    )
    return (
        trimmed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_K)
        .select("user_id", "rk", "event_id", "value")
    )


_Q138_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events WHERE value IS NOT NULL
)
SELECT user_id, rk, event_id, value
FROM ranked WHERE rk <= {TOPK_K}
"""


TOPK_QUERIES = {"q138_topk_per_key": q138_topk_per_key}
TOPK_ORACLES = {"q138_topk_per_key": _Q138_SQL}
