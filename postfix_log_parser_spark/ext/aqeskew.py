"""AQE runtime skew-join splitting (q155).

q19/q97 salt skewed keys BY HAND — the right call when you know the
skew in advance.  Adaptive Query Execution is the runtime complement:
after the map stage, Spark sees the actual reduce-partition sizes and
SPLITS the oversized one across tasks (``SortMergeJoin(skew=true)``,
``AQEShuffleRead coalesced and skewed``), no salting and no code
change.  q155 builds a deliberately skewed join (~60% of the fact on
one key) and lets AQE handle it; the result is aggregate-identical to
the unskewed plan — skew handling changes the SCHEDULE, never the
answer — which is exactly what the oracle verifies.

Operational notes baked in (each cost a debugging round):

* split granularity is per-MAP-block — a single-mapper input cannot be
  split, so the fact is round-robin repartitioned first (any real
  multi-file table already has many mappers);
* a downstream aggregate makes AQE DECLINE the split (it would break
  the co-partitioning the agg reuses) unless
  ``forceOptimizeSkewedJoin`` — production keeps the default and salts
  instead when the join feeds a same-key aggregate;
* the confs are read at EXECUTION time, so the result materializes
  inside the scope (the q151 discipline).

Scale shape: the skewed exchange is the point; everything downstream
is a 7-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


class _skew_scope:
    """Scoped AQE-skew confs (tiny thresholds so sf-scale data skews)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.old = {
            k: self.spark.conf.get(k, None) for k in _SKEW_CONFS
        }
        for k, v in _SKEW_CONFS.items():
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.old.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def _skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = F.when(F.col("l_orderkey") % 10 < 6, 0).otherwise(
        (F.col("l_orderkey") % 997) + 1
    )
    # round-robin repartition: multiple map tasks, so the skewed reduce
    # partition is divisible into map-block chunks
    fact = li.select(
        key.alias("k"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
    ).repartition(16)
    dim = spark.range(0, 998).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("band")
    )
    return (
        fact.join(dim.hint("merge"), "k")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price_c").cast("long").alias("sum_price_c"),
            F.countDistinct("k").cast("long").alias("n_keys"),
        )
    )


def q155_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per dim band: (band, n_rows, sum_price_c, n_keys) through the
    runtime-split skewed join; materialized inside the conf scope."""
    with _skew_scope(spark):
        return _skew_join(spark, sf_dir).localCheckpoint(eager=True)


_Q155_SQL = """
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 10 < 6 THEN 0
              ELSE (l_orderkey % 997) + 1 END AS k,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem
),
dim AS (SELECT i AS k, i % 7 AS band FROM range(0, 998) t(i))
SELECT band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_c) AS BIGINT) AS sum_price_c,
       CAST(count(DISTINCT k) AS BIGINT) AS n_keys
FROM fact JOIN dim USING (k)
GROUP BY band
"""


AQESKEW_QUERIES = {"q155_aqe_skew_join": q155_aqe_skew_join}
AQESKEW_ORACLES = {"q155_aqe_skew_join": _Q155_SQL}
