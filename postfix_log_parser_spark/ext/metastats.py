"""Metadata-only table statistics via parquet aggregate pushdown (q151).

COUNT/MIN/MAX over an unfiltered parquet table never needs to touch a
data page: every row group's footer already carries exact row counts
and column min/max statistics.  Spark's DSv2 parquet scan pushes the
whole aggregate into the scan (``PushedAggregation`` in the plan) and
answers from footers alone — at 100 TB that's the difference between a
sub-second catalog probe and a full-table scan, and it is how a
pipeline cheaply validates row counts and value envelopes after every
load (q126's Observation API is the in-flight variant; this is the
at-rest one).

Both confs involved are scoped and restored: aggregate pushdown only
exists on the DSv2 read path, so parquet is temporarily removed from
``spark.sql.sources.useV1SourceList`` while the plan is BUILT (lazy
plans capture the source implementation at analysis time).

Scale shape: zero shuffles of data — one metadata task per file split;
the 4-branch union is 4 one-row frames.  Pushdown silently declines on
filtered scans or unsupported types (falls back to a real scan, still
correct) — the plan pin in tests/test_plans.py guards the shape so a
regression is loud.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (label, table, numeric column) — value envelopes worth probing
_PROBED = (
    ("lineitem.l_quantity", "lineitem", "l_quantity"),
    ("orders.o_totalprice", "orders", "o_totalprice"),
    ("events.value", "events", "value"),
    ("documents.n_chars", "documents", "n_chars"),
)


def _zero_norm(c):
    return F.when(c == 0, F.lit(0.0)).otherwise(c)


def _stats_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pushdown-shaped plan — ONLY valid while the DSv2 + pushdown
    confs are live (see q151's scope)."""
    branches = []
    for label, table, col in _PROBED:
        t = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        # the aggregate list must contain ONLY count/min/max for the
        # pushdown to engage (a literal inside agg() declines it, as
        # does count(lit(1)) — only COUNT(*) matches the footer
        # row-count statistic); label and casts land ABOVE the agg
        branches.append(
            t.agg(
                F.count("*").alias("n_rows"),
                F.min(col).alias("raw_min"),
                F.max(col).alias("raw_max"),
            ).select(
                F.lit(label).alias("probe"),
                F.col("n_rows").cast("long").alias("n_rows"),
                # parquet writers canonicalize float stats as min=-0.0 /
                # max=+0.0 (per the spec's sort order), so a pushed-down
                # MIN can return the footer's -0.0 where a data scan
                # returns 0.0 — normalize the sign of zero (they are ==)
                _zero_norm(F.col("raw_min").cast("double")).alias("vmin"),
                _zero_norm(F.col("raw_max").cast("double")).alias("vmax"),
            )
        )
    return reduce(DataFrame.unionAll, branches)


class _pushdown_scope:
    """Scoped DSv2-parquet + aggregate-pushdown confs.  Both are read at
    OPTIMIZATION time, so the result must be materialized inside the
    scope (a lazily-returned plan would optimize after restore and
    silently fall back to a full scan)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        c = self.spark.conf
        self.old_v1 = c.get("spark.sql.sources.useV1SourceList")
        self.old_push = c.get("spark.sql.parquet.aggregatePushdown", "false")
        c.set(
            "spark.sql.sources.useV1SourceList",
            ",".join(
                s
                for s in self.old_v1.split(",")
                if s.strip() and s.strip() != "parquet"
            ),
        )
        c.set("spark.sql.parquet.aggregatePushdown", "true")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.useV1SourceList", self.old_v1)
        self.spark.conf.set(
            "spark.sql.parquet.aggregatePushdown", self.old_push
        )


def q151_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per probed column: (probe, n_rows, vmin, vmax) — exact,
    answered from parquet footer statistics (no data pages read).  The
    4-row result is materialized (eager localCheckpoint) while the
    pushdown confs are live, then the session state is restored."""
    with _pushdown_scope(spark):
        return _stats_plan(spark, sf_dir).localCheckpoint(eager=True)


def _probe_sql(label: str, table: str, col: str) -> str:
    return (
        f"SELECT '{label}' AS probe, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(min({col}) AS DOUBLE) AS vmin,"
        f" CAST(max({col}) AS DOUBLE) AS vmax FROM {table}"
    )


_Q151_SQL = "\nUNION ALL\n".join(
    _probe_sql(label, table, col) for label, table, col in _PROBED
)


METASTATS_QUERIES = {"q151_metadata_stats": q151_metadata_stats}
METASTATS_ORACLES = {"q151_metadata_stats": _Q151_SQL}
