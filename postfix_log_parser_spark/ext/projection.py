"""Sparse random projection for embedding compression (q142).

Johnson-Lindenstrauss random projection is the standard pre-ANN
compression step at corpus scale: project 64-dim vectors to 16 dims
with a SPARSE sign matrix (Achlioptas, PODS'01: entries +1/-1 with
probability 1/6 each, 0 otherwise, scaled by sqrt(s/D') with s = 3) so
2/3 of the multiplies vanish.  Unlike PQ (q59) this is data-independent
— no codebook to train or broadcast — which is why pipelines run it
FIRST, before any clustering sees the vectors.

Determinism contract: the "random" matrix is a pure integer hash of
(j, k) — ``(j*73856093 + k*19349663) % 6`` mapping 0 → +1, 1 → -1,
else 0 — so Spark and the DuckDB oracle materialize the *identical*
matrix with no RNG, no seed plumbing, and bit-equal output (the same
trick the salted-join and shard-export queries use for reproducible
pseudo-randomness).

Scale shape (100 TB of vectors): embarrassingly parallel — one narrow
projection inside the scan, no shuffle, no UDF (nested
``transform``/``aggregate`` over constant index ranges stays
JVM-side).  The sign matrix is never materialized as data: it is a
constant-folded expression, so there is nothing to broadcast.  The
norm-preservation ratio emitted per vector is the JL audit a pipeline
alerts on (mean ≈ 1, spread shrinking with D').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

D_IN = 64
D_OUT = 16
_H1, _H2 = 73856093, 19349663  # spatial-hash primes (public folklore pair)
_SCALE = "sqrt(3.0)/4.0"       # sqrt(s/D') with s=3, D'=16 — exact in both
_ROUND = 6


def _sign(j: Column, k: Column) -> Column:
    h = (j.cast("long") * _H1 + k.cast("long") * _H2) % 6
    return (
        F.when(h == 0, F.lit(1.0)).when(h == 1, F.lit(-1.0)).otherwise(F.lit(0.0))
    )


def q142_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector projection audit: (vec_id, y0..y3, pnorm2, onorm2,
    norm_ratio) — first 4 projected coordinates as a value witness plus
    the JL norm-preservation ratio.  NULL embeddings are dropped (no
    vector, nothing to project)."""
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    scale = F.expr(_SCALE)
    v = F.col("v")

    def y_at(k: Column) -> Column:
        return F.round(
            scale
            * F.aggregate(
                F.sequence(F.lit(0), F.lit(D_IN - 1)),
                F.lit(0.0),
                lambda acc, j: acc + F.element_at(v, j + 1) * _sign(j, k),
            ),
            _ROUND,
        )

    proj = F.transform(F.sequence(F.lit(0), F.lit(D_OUT - 1)), y_at)
    onorm2 = F.round(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x), _ROUND
    )
    out = e.select(
        "vec_id",
        proj.alias("y"),
        onorm2.alias("onorm2"),
    ).select(
        "vec_id",
        F.element_at("y", 1).alias("y0"),
        F.element_at("y", 2).alias("y1"),
        F.element_at("y", 3).alias("y2"),
        F.element_at("y", 4).alias("y3"),
        F.round(
            F.aggregate(F.col("y"), F.lit(0.0), lambda acc, x: acc + x * x),
            _ROUND,
        ).alias("pnorm2"),
        "onorm2",
    )
    return out.select(
        "vec_id", "y0", "y1", "y2", "y3", "pnorm2", "onorm2",
        F.round(
            F.when(F.col("onorm2") > 0, F.col("pnorm2") / F.col("onorm2")),
            4,
        ).alias("norm_ratio"),
    )


_SIGN_SQL = (
    f"CASE (j*{_H1} + k*{_H2}) % 6 WHEN 0 THEN 1.0 WHEN 1 THEN -1.0 "
    "ELSE 0.0 END"
)

_Q142_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
p AS (
  SELECT vec_id,
         list_transform(range(0, {D_OUT}), k ->
           round(({_SCALE}) * list_sum(list_transform(range(0, {D_IN}),
             j -> v[j + 1] * {_SIGN_SQL})), {_ROUND})) AS y,
         round(list_sum(list_transform(v, x -> x * x)), {_ROUND}) AS onorm2
  FROM e
),
q AS (
  SELECT vec_id, y[1] AS y0, y[2] AS y1, y[3] AS y2, y[4] AS y3,
         round(list_sum(list_transform(y, x -> x * x)), {_ROUND}) AS pnorm2,
         onorm2
  FROM p
)
SELECT vec_id, y0, y1, y2, y3, pnorm2, onorm2,
       round(CASE WHEN onorm2 > 0 THEN pnorm2 / onorm2 END, 4) AS norm_ratio
FROM q
"""


PROJECTION_QUERIES = {"q142_random_projection": q142_random_projection}
PROJECTION_ORACLES = {"q142_random_projection": _Q142_SQL}
