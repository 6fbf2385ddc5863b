"""Join/shuffle key-skew audit (q147).

Skewed keys are the #1 scale killer for shuffles (the reason q19/q97
exist): one hot key serializes a join or aggregate onto one reducer.
Before picking a partition strategy, a pipeline AUDITS its candidate
shuffle keys: rows per key, hottest key, and the hot/median ratio —
the number that says "salt this" (ratio ≫ 1) or "plain hash is fine"
(ratio ≈ 1).  This is the measurement q19 (salted agg) and q97 (salted
join) act on.

Scale shape (100 TB): per audited key one hash aggregate collapses the
corpus map-side to a |keys|-row counts table; every statistic runs on
that table, never the corpus.  The hottest key is a second aggregate
over the counts table gated on a broadcast 1-row max — no window, no
sort, no collect.  The exact ``percentile`` on the counts column is
|keys|-bounded; for billion-key audits swap it for
``approx_percentile`` (same plan shape, mergeable sketch).  Branches
union into one report and schedule concurrently.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (report label, table, key column) — the engine's own shuffle keys
_AUDITED = (
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
    ("documents.source", "documents", "source"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
)


def q147_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per audited key: (key_name, n_rows, n_keys, max_rows,
    median_rows, skew_ratio, hot_key) — hot_key is the smallest key
    value among those at max_rows (deterministic tie-break), rendered
    as a string so heterogeneous key types union."""
    reports = []
    for label, table, key in _AUDITED:
        counts = (
            spark.read.parquet(f"{sf_dir}/{table}.parquet")
            .filter(F.col(key).isNotNull())
            .select(F.col(key).cast("string").alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        summary = counts.agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("n").cast("long").alias("max_rows"),
            F.round(F.expr("percentile(n, 0.5)"), 2).alias("median_rows"),
        )
        hot = (
            counts.join(
                F.broadcast(summary.select("max_rows")),
                counts["n"] == F.col("max_rows"),
            )
            .agg(F.min("k").alias("hot_key"))
        )
        reports.append(
            summary.join(F.broadcast(hot)).select(
                F.lit(label).alias("key_name"),
                "n_rows",
                "n_keys",
                "max_rows",
                "median_rows",
                F.round(
                    F.when(
                        F.col("median_rows") > 0,
                        F.col("max_rows") / F.col("median_rows"),
                    ),
                    2,
                ).alias("skew_ratio"),
                "hot_key",
            )
        )
    return reduce(DataFrame.unionAll, reports)


def _branch_sql(label: str, table: str, key: str) -> str:
    return f"""
SELECT '{label}' AS key_name, n_rows, n_keys, max_rows, median_rows,
       round(CASE WHEN median_rows > 0
                  THEN max_rows / median_rows END, 2) AS skew_ratio,
       hot_key
FROM (
  WITH c AS (
    SELECT CAST({key} AS VARCHAR) AS k, count(*) AS n
    FROM {table} WHERE {key} IS NOT NULL GROUP BY 1
  )
  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n) AS BIGINT) AS max_rows,
         round(median(n::DOUBLE), 2) AS median_rows,
         (SELECT min(k) FROM c WHERE n = (SELECT max(n) FROM c)) AS hot_key
  FROM c
)"""


_Q147_SQL = "\nUNION ALL\n".join(
    _branch_sql(label, table, key) for label, table, key in _AUDITED
)


SKEW_QUERIES = {"q147_skew_audit": q147_skew_audit}
SKEW_ORACLES = {"q147_skew_audit": _Q147_SQL}
