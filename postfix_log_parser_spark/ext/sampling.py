"""Weighted sampling for training-data mixing (q62).

q62 — **weighted reservoir sample without replacement** (Efraimidis &
Spirakis A-ES, "Weighted random sampling with a reservoir", IPL 2006):
each document gets key ``u^(1/w)`` for a uniform ``u`` and weight ``w``;
the k largest keys ARE a weighted sample without replacement.  Ranking
by ``ln(u)/w`` is order-equivalent and numerically tamer.

Distributed shape: the key is a pure narrow expression, and top-k is
``orderBy().limit(k)`` — Spark's TakeOrderedAndProject, a per-partition
k-heap plus a k-row merge, NEVER a global sort.  That is exactly the
100 TB shape: one scan, O(k) driver/merge state.  The rank column is
re-derived by a window over the k surviving rows only (bounded, single
tiny partition by construction).

Determinism: ``u`` is md5-derived from doc_id (the portable hash the
dedup family already uses — bit-identical in Spark and DuckDB), so the
"random" sample is reproducible across runs, partitionings, AND engines;
weights are ``n_chars`` (longer docs proportionally likelier, the usual
token-budget-aware mix).  ``ln`` is evaluated on identical doubles in
both engines; adjacent keys are separated far beyond 1 ulp, so the
ranking is stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SAMPLE_K = 100


def weighted_sample(docs: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """A-ES weighted sample of ``k`` docs from any (doc_id, source,
    n_chars) frame — layout-independent because the key is a pure
    function of doc_id."""
    # portable uniform in (0,1): first 60 md5 bits mod 1e9, offset half a
    # bucket so u is never 0 (ln(0) = -inf)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    u = ((h % 1000000000).cast("double") + 0.5) / 1000000000.0
    key = F.log(u) / F.col("n_chars")
    top = (
        docs.withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("es_key").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).alias("sample_rank"), "doc_id", "source", "n_chars"
    )


def q62_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        # a zero/negative weight has zero selection probability in A-ES —
        # and would divide ln(u) by zero under ANSI mode
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars")
    )
    return weighted_sample(docs)


_Q62_SQL = f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1000000000) + 0.5) / 1000000000.0 AS u
  FROM documents WHERE n_chars > 0
),
k AS (SELECT doc_id, source, n_chars, ln(u) / n_chars AS es_key FROM d),
ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (ORDER BY es_key DESC, doc_id) AS sample_rank
  FROM k
)
SELECT sample_rank, doc_id, source, n_chars
FROM ranked WHERE sample_rank <= {SAMPLE_K}
"""

SAMPLING_QUERIES = {"q62_weighted_sample": q62_weighted_sample}
SAMPLING_ORACLES = {"q62_weighted_sample": _Q62_SQL}
