"""Similarity search over the ``embeddings`` table (``array<float>``).

* q25 — brute-force cosine top-k: the exact baseline.  Query set is tiny
  (broadcast), so the plan is a broadcast nested-loop over the candidate
  side — a single scan of the big table, no shuffle of the vectors.
* q26 — random-hyperplane LSH buckets: the scale path.  Vectors are
  sign-hashed into 2^8 buckets; a query only scans its own bucket
  (≈ n/256 of the data), then exact-reranks.  Recall < 1 by design —
  deterministic, because the hyperplanes are md5-derived constants
  embedded identically in the Spark plan and the DuckDB oracle.

Dot products run in double precision as a sequential fold on both engines
so results agree bit-for-bit; ranking tie-breaks on vec_id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
N_PLANES = 8
TOP_K = 5


def _plane_value(j: int, d: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1): md5-seeded
    so the identical constants appear in Spark and oracle SQL."""
    h = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


PLANES: list[list[float]] = [
    [_plane_value(j, d) for d in range(DIM)] for j in range(N_PLANES)
]


def _dot(u: Column, w: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL embeddings are dropped at the scan: no vector operator can
    use them, and a single null row would poison every driver-collected
    model (k-means init, PQ codebooks) and the cogroup matmuls."""
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))


_DUCK_DOT_AB = "list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))"
_DUCK_NORM = "sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i])))"


# ---------------------------------------------------------------------------
# q25 — brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------

def q25_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(_emb(spark, sf_dir))
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    # project BEFORE the rank exchange (guide §2.3): the window only
    # needs (qid, vec_id, cos_raw) — without the select, every candidate
    # pair ships both 64-dim vectors + norms through the Exchange+Sort
    return (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "qid",
            "rn",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("cos_raw"), 4).alias("cosine"),
        )
    )


_Q25_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
n AS (SELECT vec_id, v, {_DUCK_NORM} AS nrm FROM e),
q AS (SELECT vec_id AS qid, v, nrm FROM n WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.qid, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * b.v[i]))
           / (q.nrm * b.nrm) AS cos_raw
  FROM q JOIN n b ON b.vec_id != q.qid
),
ranked AS (
  SELECT qid, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_raw DESC, neighbor_id) AS rn
  FROM scored
)
SELECT qid, rn, neighbor_id, round(cos_raw, 4) AS cosine
FROM ranked WHERE rn <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# q26 — LSH-bucketed ANN (the scale path)
# ---------------------------------------------------------------------------

def _bucket_expr(v: Column) -> Column:
    """Sign-hash bucket: bit j set iff dot(v, plane_j) > 0."""
    bucket = None
    for j, plane in enumerate(PLANES):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(v, plane_col) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def q26_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign-hash bucket; exact
    cosine rerank inside the bucket, top-3 per query.  The bucket join is
    an equi-join on the bucket id — at scale the embedding table is
    pre-bucketed (partitioned by bucket) so a query touches one partition."""
    emb = _with_norm(_emb(spark, sf_dir)).withColumn("bucket", _bucket_expr(F.col("v")))
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "qid",
            "rn",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("cos_raw"), 4).alias("cosine"),
        )
    )


def _q26_sql() -> str:
    planes_sql = ", ".join(
        "[" + ", ".join(repr(x) for x in plane) + "]" for plane in PLANES
    )
    bucket_terms = " + ".join(
        f"CASE WHEN list_sum(list_transform(range(1, len(v) + 1),"
        f" i -> v[i] * planes[{j + 1}][i])) > 0 THEN {1 << j} ELSE 0 END"
        for j in range(N_PLANES)
    )
    return f"""
WITH p AS (SELECT [{planes_sql}]::DOUBLE[][] AS planes),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
n AS (
  SELECT vec_id, v, {_DUCK_NORM} AS nrm,
         CAST({bucket_terms} AS INTEGER) AS bucket
  FROM e, p
),
q AS (SELECT vec_id AS qid, v, nrm, bucket FROM n WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.qid, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * b.v[i]))
           / (q.nrm * b.nrm) AS cos_raw
  FROM q JOIN n b ON b.bucket = q.bucket AND b.vec_id != q.qid
),
ranked AS (
  SELECT qid, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_raw DESC, neighbor_id) AS rn
  FROM scored
)
SELECT qid, rn, neighbor_id, round(cos_raw, 4) AS cosine
FROM ranked WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# q33 — IVF-style ANN (coarse quantizer cells + nprobe)
# ---------------------------------------------------------------------------

N_CELLS = 16
NPROBE = 2


def _centroid_value(c: int, d: int) -> float:
    h = int(hashlib.md5(f"centroid{c}_{d}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


CENTROIDS: list[list[float]] = [
    [_centroid_value(c, d) for d in range(DIM)] for c in range(N_CELLS)
]


def _cell_scores(v: Column) -> Column:
    """Array of inner products against every centroid (one array column,
    so downstream argmax expressions duplicate one reference, not 16
    interpreted dot-folds)."""
    return F.array(
        *[_dot(v, F.array(*[F.lit(x) for x in cent])) for cent in CENTROIDS]
    )


def q33_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inner-product ANN: vectors are assigned to their best coarse
    cell (16 deterministic md5-derived centroids — a fixed quantizer so
    the oracle is exact; in production the centroids come from k-means);
    a query probes its top-``NPROBE`` cells and exact-reranks inside them.

    Scale shape: the cell id is a partition key — the embedding table is
    stored partitioned by cell, so each query reads nprobe/16 of the data
    with partition pruning; candidate generation is an equi-join on cell,
    never all-pairs."""
    emb = _with_norm(_emb(spark, sf_dir)).withColumn(
        "cs", _cell_scores(F.col("v"))
    )
    cs = F.col("cs")
    cell = (F.array_position(cs, F.array_max(cs)) - 1).cast("int")
    emb = emb.withColumn("cell", cell)
    # 2nd-best cell: mask the winner to -inf, argmax again (same
    # first-position tie-break as the oracle's list_position)
    masked = F.transform(
        cs,
        lambda x, i: F.when(i == F.col("cell"), F.lit(float("-inf"))).otherwise(x),
    )
    probe2 = (F.array_position(masked, F.array_max(masked)) - 1).cast("int")
    q = emb.filter(F.col("vec_id") % 100 == 0).withColumn("p2", probe2)
    queries = q.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(F.array(F.col("cell"), F.col("p2"))).alias("probe_cell"),
    )
    emb = emb.drop("cs")
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        emb.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "qid",
            "rn",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("cos_raw"), 4).alias("cosine"),
        )
    )


def _q33_sql() -> str:
    cents_sql = ", ".join(
        "[" + ", ".join(repr(x) for x in cent) + "]" for cent in CENTROIDS
    )
    score = (
        "list_transform(cents, c -> "
        "list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * c[i])))"
    )
    return f"""
WITH cfg AS (SELECT [{cents_sql}]::DOUBLE[][] AS cents),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
scored AS (
  SELECT vec_id, v, {_DUCK_NORM} AS nrm, {score} AS cs
  FROM e, cfg
),
cells AS (
  SELECT vec_id, v, nrm, cs,
         CAST(list_position(cs, list_max(cs)) - 1 AS INTEGER) AS cell
  FROM scored
),
q AS (
  SELECT vec_id AS qid, v, nrm, cell AS p1,
         CAST(list_position(cs, list_max(list_transform(range(1, len(cs) + 1),
              j -> CASE WHEN j - 1 = cell THEN '-infinity'::DOUBLE
                        ELSE cs[j] END))) - 1 AS INTEGER) AS p2
  FROM cells WHERE vec_id % 100 = 0
),
probes AS (
  SELECT qid, v, nrm, unnest([p1, p2]) AS probe_cell FROM q
),
cand AS (
  SELECT p.qid, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(p.v) + 1), i -> p.v[i] * b.v[i]))
           / (p.nrm * b.nrm) AS cos_raw
  FROM probes p JOIN cells b
    ON b.cell = p.probe_cell AND b.vec_id != p.qid
),
ranked AS (
  SELECT qid, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_raw DESC, neighbor_id) AS rn
  FROM cand
)
SELECT qid, rn, neighbor_id, round(cos_raw, 4) AS cosine
FROM ranked WHERE rn <= 3
"""


SIMILARITY_QUERIES = {
    "q25_ann_bruteforce": q25_ann_bruteforce,
    "q26_ann_lsh": q26_ann_lsh,
    "q33_ann_ivf": q33_ann_ivf,
}

SIMILARITY_ORACLES = {
    "q25_ann_bruteforce": _Q25_SQL,
    "q26_ann_lsh": _q26_sql(),
    "q33_ann_ivf": _q33_sql(),
}
