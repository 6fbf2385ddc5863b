"""Sparse random projection for embedding compression (q142).

Johnson-Lindenstrauss random projection is the standard pre-ANN
compression step at corpus scale: project 64-dim vectors to 16 dims
with a SPARSE sign matrix (Achlioptas, PODS'01: entries +1/-1 with
probability 1/6 each, 0 otherwise, scaled by sqrt(s/D') with s = 3) so
2/3 of the multiplies vanish.  Unlike PQ (q59) this is data-independent
— no codebook to train or broadcast — which is why pipelines run it
FIRST, before any clustering sees the vectors.

Determinism contract: the sign matrix is derived ONCE, in Python at
plan-construction time, from ``md5("jl|j|k")`` per entry (first 60 bits
mod 6: 0 → +1, 1 → -1, else 0 — the same portable-md5 trick the
split/sampling queries use) and embedded as constant literals in BOTH
the Spark expression and the DuckDB oracle.  Neither engine hashes at
runtime, there is no RNG and no seed plumbing, and the output is
bit-equal.  An earlier revision used ``(j*H1 + k*H2) % 6`` with two
spatial-hash primes; that pair is degenerate mod 6 (both ≡ 5), which
collapsed the matrix to 6 distinct rows — md5 mixing removes the
algebraic structure entirely (verified: all 16 projection columns
distinct, nonzero density 0.318 ≈ 1/3).

Scale shape (100 TB of vectors): embarrassingly parallel — one narrow
projection inside the scan, no shuffle, no UDF.  Each output coordinate
is a constant-folded sum of ~21 signed ``element_at`` terms (only the
nonzero matrix entries are emitted), so the whole projection stays
inside whole-stage codegen and there is nothing to broadcast.  The
norm-preservation ratio emitted per vector is the JL audit a pipeline
alerts on (mean ≈ 1, spread shrinking with D').
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

D_IN = 64
D_OUT = 16
_SCALE = "sqrt(3.0)/4.0"  # sqrt(s/D') with s=3, D'=16 — exact in both
_ROUND = 6


def _hround(x, digits: int):
    """Half-up rounding as floor(x·10^d + 0.5)/10^d — plain IEEE ops
    that both engines execute identically on the identical input double.
    Native round() differs between Spark (BigDecimal HALF_UP on the
    double's exact decimal expansion) and DuckDB (C rounding of x·10^d)
    by one display ulp exactly on .5 boundaries — found at sf0.1, where
    5 of 2000 norm_ratios landed on a .00005 tie."""
    p = float(10 ** digits)
    return F.floor(x * p + 0.5) / p


def _sign(j: int, k: int) -> int:
    h = int(hashlib.md5(f"jl|{j}|{k}".encode()).hexdigest()[:15], 16) % 6
    return 1 if h == 0 else (-1 if h == 1 else 0)


# nonzero entries per output coordinate: k -> [(j, sign), ...]
_NONZERO: list[list[tuple[int, int]]] = [
    [(j, s) for j in range(D_IN) if (s := _sign(j, k)) != 0]
    for k in range(D_OUT)
]


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

    def y_at(k: int) -> Column:
        acc = F.lit(0.0)
        for j, s in _NONZERO[k]:
            term = F.element_at(v, j + 1)
            acc = acc + term if s > 0 else acc - term
        return _hround(scale * acc, _ROUND)

    ys = [y_at(k).alias(f"yk{k}") for k in range(D_OUT)]
    onorm2 = _hround(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x), _ROUND
    )
    proj = e.select("vec_id", *ys, onorm2.alias("onorm2"))
    pnorm2 = _hround(
        sum(F.col(f"yk{k}") * F.col(f"yk{k}") for k in range(D_OUT)),
        _ROUND,
    )
    out = proj.select(
        "vec_id",
        F.col("yk0").alias("y0"),
        F.col("yk1").alias("y1"),
        F.col("yk2").alias("y2"),
        F.col("yk3").alias("y3"),
        pnorm2.alias("pnorm2"),
        "onorm2",
    )
    return out.select(
        "vec_id", "y0", "y1", "y2", "y3", "pnorm2", "onorm2",
        F.when(
            F.col("onorm2") > 0,
            _hround(F.col("pnorm2") / F.col("onorm2"), 4),
        ).alias("norm_ratio"),
    )


def _hround_sql(expr: str, digits: int) -> str:
    p = 10 ** digits
    return f"floor(({expr}) * {p}.0 + 0.5) / {p}.0"


def _y_sql(k: int) -> str:
    terms = "".join(
        (" + " if s > 0 else " - ") + f"v[{j + 1}]" for j, s in _NONZERO[k]
    )
    return _hround_sql(f"({_SCALE}) * (0.0{terms})", _ROUND)


_Q142_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
p AS (
  SELECT vec_id,
         {", ".join(f"{_y_sql(k)} AS yk{k}" for k in range(D_OUT))},
         {_hround_sql("list_sum(list_transform(v, x -> x * x))", _ROUND)} AS onorm2
  FROM e
),
q AS (
  SELECT vec_id, yk0 AS y0, yk1 AS y1, yk2 AS y2, yk3 AS y3,
         {_hround_sql(" + ".join(f"yk{k}*yk{k}" for k in range(D_OUT)), _ROUND)} AS pnorm2,
         onorm2
  FROM p
)
SELECT vec_id, y0, y1, y2, y3, pnorm2, onorm2,
       CASE WHEN onorm2 > 0
            THEN {_hround_sql("pnorm2 / onorm2", 4)} END AS norm_ratio
FROM q
"""


PROJECTION_QUERIES = {"q142_random_projection": q142_random_projection}
PROJECTION_ORACLES = {"q142_random_projection": _Q142_SQL}
