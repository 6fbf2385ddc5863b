"""Dynamic partition pruning over a partitioned fact table (q152).

At warehouse scale the fact table is partitioned on a key (here
``event_type``; in production usually the date) and most queries join
it to a small filtered dimension.  Static pruning can't help — the
fact-side predicate only EXISTS after the dim is filtered — so Catalyst
injects a ``dynamicpruningexpression`` into the fact scan's
PartitionFilters: the dim's broadcast result doubles as the partition
filter, and entire fact partitions are skipped at runtime.  With 5
event-type partitions and a dim keeping 2, the scan reads 2/5 of the
table; at 100 TB with daily partitions this is the difference between
scanning 3 years and scanning last week.

The fact is materialized once per call into the scratch root
(partitionBy("event_type"), same lifecycle as q44's sink) and the dim
is ALSO read from parquet — an inline local-relation dim would be
constant-folded into a static IN filter and DPP would never be
exercised.  Both engines aggregate exact integer cents so the join
result hashes identically.

Plan pin: tests/test_plans.py asserts ``dynamicpruningexpression`` in
the fact scan's PartitionFilters and that the dim rides a broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEPT = ("purchase", "signup")  # dim rows that survive the filter


def _materialize(spark: SparkSession, sf_dir: str) -> str:
    """Write the partitioned fact + the dim table once per call; the
    scratch root is atexit-cleaned (q44's lifecycle)."""
    # function-scope import: logquery itself imports ext.staging (whose
    # package __init__ imports this module), so a module-level import here
    # is circular whenever logquery is imported first (test modules do)
    from postfix_log_parser_spark.logquery import _work_dir

    work = _work_dir("q152_dpp_")
    fact_path = os.path.join(work, "fact")
    dim_path = os.path.join(work, "dim")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isNotNull()
    )
    ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).write.mode("overwrite").partitionBy("event_type").parquet(fact_path)
    dim = spark.createDataFrame(
        [("view", 1), ("click", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        "event_type string, type_rank int",
    )
    dim.write.mode("overwrite").parquet(dim_path)
    return work


def _dpp_plan(spark: SparkSession, work: str) -> DataFrame:
    # explicit schema: an EMPTY events table writes a part-less
    # partitioned dir, which schema inference rejects (zero rows must
    # yield zero rows, not an AnalysisException)
    fact = spark.read.schema(
        "event_id long, user_id long, cents long, event_type string"
    ).parquet(os.path.join(work, "fact"))
    dim = (
        spark.read.parquet(os.path.join(work, "dim"))
        .filter(F.col("event_type").isin(*_KEPT))
    )
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type", "type_rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


def q152_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per surviving event type: (event_type, type_rank, n_events,
    sum_cents, n_users) — computed through a dim-filtered join whose
    partition pruning happens at RUNTIME (DPP)."""
    return _dpp_plan(spark, _materialize(spark, sf_dir))


_KEPT_SQL = ", ".join(f"'{t}'" for t in _KEPT)

_Q152_SQL = f"""
WITH dim AS (
  SELECT * FROM (VALUES ('view', 1), ('click', 2), ('purchase', 3),
                        ('signup', 4), ('error', 5))
         AS d(event_type, type_rank)
  WHERE event_type IN ({_KEPT_SQL})
)
SELECT e.event_type, d.type_rank,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN dim d USING (event_type)
WHERE e.event_type IS NOT NULL
GROUP BY e.event_type, d.type_rank
"""


DPP_QUERIES = {"q152_dpp_prune": q152_dpp_prune}
DPP_ORACLES = {"q152_dpp_prune": _Q152_SQL}
