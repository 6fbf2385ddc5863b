"""Distributed k-means clustering over the ``embeddings`` table (q58).

Lloyd's algorithm, the canonical distributed-iterative pattern for
training-data curation (semantic bucketing before mixing / dedup):

* **assignment** is a narrow Catalyst map — squared L2 distance to each
  of the K centroid constants folded JVM-side, argmin via
  ``array_position(ds, array_min(ds))`` (first-index tie-break) — no
  shuffle, no UDF, scales linearly with the table;
* **update** is one ``posexplode → groupBy(cluster, pos) → avg``
  aggregation (map-side partial agg, one hash shuffle of K·DIM groups)
  whose K·DIM-row result is collected to the driver — centroid state is
  O(K·D) by construction in every distributed k-means (this is the
  sanctioned bounded collect, same shape as MLlib's);
* iterations re-broadcast the rounded centroids as plan literals.

Determinism for the DuckDB oracle: init centroids are the K smallest
``vec_id`` vectors (no RNG), updated centroid means are rounded to 6
decimals in BOTH engines before re-use (so cross-engine float-summation
order cannot flip an argmin), and distances fold in identical term order.

At 100 TB: assignment stays a narrow map over the partitioned table; the
update shuffle moves only K·DIM·partitions partial sums.  The reference
has no clustering surface — this is a north-star extension (SURVEY §2
"beyond" list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.similarity import DIM, _emb

K = 8
ITERS = 2
_ROUND = 6


def _sqdist(v: Column, cent: list[float]) -> Column:
    """Squared L2 distance to a constant centroid, sequential fold so the
    term order matches the oracle's ``list_sum(list_transform(...))``."""
    c = F.array(*[F.lit(x) for x in cent])
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Add ``cluster`` (argmin over centroid distances, first-index
    tie-break) and ``d2`` (that minimum) as pure Catalyst columns."""
    ds = F.array(*[_sqdist(F.col("v"), c) for c in cents])
    return (
        emb.withColumn("ds", ds)
        .withColumn(
            "cluster", (F.array_position(F.col("ds"), F.array_min("ds")) - 1).cast("int")
        )
        .withColumn("d2", F.array_min("ds"))
        .drop("ds")
    )


def _update(assigned: DataFrame, cents: list[list[float]]) -> list[list[float]]:
    """One centroid update: distributed per-(cluster, dim) mean, rounded
    to ``_ROUND`` decimals engine-side, collected as K·DIM bounded rows.
    An empty cluster keeps its previous centroid (oracle: LEFT JOIN +
    coalesce)."""
    rows = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("x"), _ROUND).alias("m"))
        .collect()
    )
    fresh: dict[int, list[float]] = {}
    for r in rows:
        fresh.setdefault(r.cluster, [0.0] * DIM)[r.pos] = r.m
    # len(cents) may be < K when init rows were null-dropped — the
    # cluster count follows the actual centroid list, not the constant
    return [fresh.get(c, cents[c]) for c in range(len(cents))]


def q58_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 k-means, 2 Lloyd iterations, deterministic init (the K
    smallest vec_ids).  Returns per-cluster size and mean squared
    distance — the curation-facing summary (cluster balance + tightness).
    """
    emb = _emb(spark, sf_dir)
    init = sorted(
        emb.filter(F.col("vec_id") < K).collect(), key=lambda r: r.vec_id
    )  # bounded: K rows
    if not init:  # empty table → empty summary, not an unresolvable plan
        return spark.createDataFrame(
            [], "cluster_id int, n_members long, mean_sq_dist double"
        )
    cents = [list(r.v) for r in init]
    for it in range(ITERS - 1):
        cents = _update(_assign(emb, cents), cents)
    final = _assign(emb, cents)
    return final.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("d2"), 4).alias("mean_sq_dist"),
    )


_D2 = (
    "list_sum(list_transform(range(1, len(e.v) + 1),"
    " i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))"
)

_Q58_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
c0 AS (SELECT vec_id AS c, v AS cv FROM e WHERE vec_id < {K}),
d1 AS (
  SELECT e.vec_id, e.v, c.c, {_D2} AS d2,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_D2}, c.c) AS rn
  FROM e, c0 c
),
m1 AS (SELECT vec_id, v, c AS cluster FROM d1 WHERE rn = 1),
u1 AS (
  SELECT cluster, pos, round(avg(v[pos]), {_ROUND}) AS m
  FROM m1, unnest(range(1, len(v) + 1)) AS t(pos)
  GROUP BY cluster, pos
),
cn AS (SELECT cluster AS c, list(m ORDER BY pos) AS cv FROM u1 GROUP BY cluster),
c1 AS (SELECT c0.c, coalesce(cn.cv, c0.cv) AS cv FROM c0 LEFT JOIN cn ON cn.c = c0.c),
d2s AS (
  SELECT e.vec_id, c.c, {_D2} AS d2,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_D2}, c.c) AS rn
  FROM e, c1 c
),
m2 AS (SELECT vec_id, c AS cluster, d2 FROM d2s WHERE rn = 1)
SELECT CAST(cluster AS INTEGER) AS cluster_id,
       count(*) AS n_members,
       round(avg(d2), 4) AS mean_sq_dist
FROM m2 GROUP BY cluster
"""

CLUSTER_QUERIES = {"q58_kmeans": q58_kmeans}
CLUSTER_ORACLES = {"q58_kmeans": _Q58_SQL}
