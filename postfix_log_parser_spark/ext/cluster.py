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

# ---------------------------------------------------------------------------
# q114 — cluster-blocked semantic near-dup (SemDeDup shape)
# ---------------------------------------------------------------------------

COS_THRESHOLD = 0.45
_COS_SLACK = 0.4485  # pre-round filter margin (q24's discipline)


def q114_semantic_blocked_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-duplicate pairs found WITHIN k-means clusters — the
    published SemDeDup recipe (Abbas et al., "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication", arXiv
    2303.09540): coarse-cluster the embedding space, then run exact
    cosine only inside each cluster.  Compute drops from O(N²) to
    O(Σ n_k²) ≈ O(N²/K) — with K grown ∝ N this is the linear-ish scale
    path for SEMANTIC dedup, complementing the lexical q22/q107 and
    answering q24's guard (q24 is the exact all-pairs oracle; THIS is
    what you run on a production corpus).

    Plan: q58's deterministic 2-iteration Lloyd centroids (bounded K·DIM
    collect), one narrow Catalyst assignment pass, then one hash shuffle
    on ``cluster`` into a per-cluster BLAS block (``applyInPandas``).
    The parallel unit is the cluster; at 100 TB, K is sized so the
    largest cluster fits one executor (or recursively re-blocked).
    Known recall tradeoff: cross-cluster pairs are missed by design —
    multi-probe assignment (2 nearest centroids) is the standard recall
    knob and keeps the same plan shape.
    """
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    init = sorted(
        emb.filter(F.col("vec_id") < K).collect(), key=lambda r: r.vec_id
    )
    out_schema = "cluster int, id_a long, id_b long, cosine double"
    if not init:
        return spark.createDataFrame([], out_schema)
    cents = [list(r.v) for r in init]
    for _ in range(ITERS - 1):
        cents = _update(_assign(emb, cents), cents)
    assigned = _assign(emb, cents).select("cluster", "vec_id", "v")

    def block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame(
                {"cluster": [], "id_a": [], "id_b": [], "cos_raw": []}
            ).astype(
                {
                    "cluster": "int32",
                    "id_a": "int64",
                    "id_b": "int64",
                    "cos_raw": "float64",
                }
            )
        ids = pdf["vec_id"].to_numpy()
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        mat = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
        cos = mat @ mat.T
        ii, jj = np.nonzero((cos >= _COS_SLACK) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {
                "cluster": np.full(len(ii), int(pdf["cluster"].iloc[0]),
                                   dtype="int32"),
                "id_a": ids[ii],
                "id_b": ids[jj],
                "cos_raw": cos[ii, jj],
            }
        )

    pairs = assigned.groupBy("cluster").applyInPandas(
        block, "cluster int, id_a long, id_b long, cos_raw double"
    )
    return (
        pairs.withColumn("cosine", F.round(F.col("cos_raw"), 3))
        .filter(F.col("cosine") >= COS_THRESHOLD)
        .select("cluster", "id_a", "id_b", "cosine")
    )


_Q114_SQL = f"""
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
  SELECT e.vec_id, e.v, c.c, {_D2} AS d2,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_D2}, c.c) AS rn
  FROM e, c1 c
),
m2 AS (SELECT vec_id, v, c AS cluster FROM d2s WHERE rn = 1),
n AS (
  SELECT vec_id, v, cluster,
         sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS nrm
  FROM m2
)
SELECT CAST(a.cluster AS INTEGER) AS cluster,
       a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
             / (a.nrm * b.nrm), 3) AS cosine
FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
            / (a.nrm * b.nrm), 3) >= {COS_THRESHOLD}
"""

CLUSTER_QUERIES = {
    "q58_kmeans": q58_kmeans,
    "q114_semantic_blocked_neardup": q114_semantic_blocked_neardup,
}
CLUSTER_ORACLES = {
    "q58_kmeans": _Q58_SQL,
    "q114_semantic_blocked_neardup": _Q114_SQL,
}
