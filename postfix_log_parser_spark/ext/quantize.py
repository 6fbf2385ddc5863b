"""Embedding quantization for the similarity-search scale path.

* q59 — **product quantization (PQ) + ADC search**: vectors are split
  into M=8 subspaces of 8 dims; each subspace has a 16-entry codebook
  (deterministic "training sample": the subvectors of the 16 smallest
  vec_ids, so the DuckDB oracle is exact — production would k-means the
  sample, q58 shows that loop).  Every vector is encoded to 8 small
  codes (8 bytes instead of 512), and search is asymmetric-distance
  computation: the query precomputes an M×16 lookup table of
  query-sub · codeword dot products (broadcast), and candidate scoring
  touches ONLY the codes — ``score = Σ_m lut[m][code_m]`` — never the
  raw vectors.  The top-k then reranks with the exact cosine (one
  equi-join back to the vector table).  At 100 TB this is the classic
  IVF-PQ memory shape: the scan side holds 8-byte codes, a 64× smaller
  working set, and the LUT join is a broadcast.
* q60 — **int8 scalar quantization round-trip**: per-dimension min/max
  (one agg), uniform 8-bit encode/decode, and the per-dimension
  reconstruction-error report a curation pipeline needs before shipping
  compressed embeddings.  The 64-row dim-stats table is broadcast back
  onto the exploded values — no second pass over the driver.

Both oracles are exact: codebooks/stats derive from raw table values
(float→double is exact), distances and ADC sums fold in identical term
order on both engines, and display columns round late.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.ext.similarity import _dot, _emb, _with_norm
from postfix_log_parser_spark.ext.staging import StageCache

M = 8  # subspaces
SUB = 8  # dims per subspace
CW = 16  # codewords per subspace
PQ_TOP_K = 3


def _const_arr(xs: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in xs])


def _cb_lit(cb: list[list[list[float]]]) -> Column:
    """The whole codebook as ONE literal array<array<array<double>>> so
    encode/LUT are single higher-order-function expressions — a compact
    Catalyst tree instead of M×CW unrolled folds (which parse/compile
    ~10× slower for identical results)."""
    return F.array(*[F.array(*[_const_arr(cw) for cw in cbm]) for cbm in cb])


def _sqd(sub: Column, cw: Column) -> Column:
    """Squared L2, sequential fold (oracle term order)."""
    return F.aggregate(
        F.zip_with(sub, cw, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _codebook(emb: DataFrame) -> list[list[list[float]]]:
    """cb[m][c] = subvector m of the c-th smallest vec_id (bounded
    collect: CW rows — the PQ training sample is driver-resident by
    construction, like any trained codebook)."""
    rows = sorted(
        emb.filter(F.col("vec_id") < CW).collect(), key=lambda r: r.vec_id
    )
    return [
        [list(r.v[m * SUB : (m + 1) * SUB]) for r in rows] for m in range(M)
    ]


def _codes_expr(v: Column, cb_lit: Column) -> Column:
    """PQ encode: argmin codeword per subspace (first-index tie-break)."""

    def per_m(cbm: Column, m: Column) -> Column:
        sub = F.slice(v, m * SUB + 1, SUB)
        ds = F.transform(cbm, lambda cw: _sqd(sub, cw))
        return (F.array_position(ds, F.array_min(ds)) - 1).cast("int")

    return F.transform(cb_lit, per_m)


def _lut_expr(v: Column, cb_lit: Column) -> Column:
    """ADC lookup table: query-sub · codeword for every (m, c)."""

    def per_m(cbm: Column, m: Column) -> Column:
        sub = F.slice(v, m * SUB + 1, SUB)
        return F.transform(cbm, lambda cw: _dot(sub, cw))

    return F.transform(cb_lit, per_m)


def _adc_expr() -> Column:
    """Σ_m lut[m][code_m] — zip_with keeps the m-ascending fold order
    the oracle uses."""
    return F.aggregate(
        F.zip_with(
            F.col("lut"), F.col("codes"), lambda l, c: F.element_at(l, c + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_PQ_EMPTY_SCHEMA = "qid long, rn int, neighbor_id long, adc_dot double, cosine double"

# the PQ training sample (16 rows -> M x CW x SUB floats) is a bounded
# driver-resident model, the same class as the k-means centroids or
# q63's bigram NLLs: stage it per (session, corpus fingerprint) so the
# five consumers (q59/q68/q157/q159 x2) collect it once, not per call
_CB_STAGE = StageCache(inputs=("embeddings.parquet",))


def _codebook_staged(spark: SparkSession, sf_dir: str, emb: DataFrame):
    key = _CB_STAGE.key(spark, sf_dir)
    cached = _CB_STAGE.get(key)
    if cached is not None:
        return cached
    cb = _codebook(emb)
    if not cb[0]:
        return cb  # empty corpus: never cache the miss
    return _CB_STAGE.put(key, cb)


def q59_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode the table, ADC-score candidates against broadcast query
    LUTs, exact-cosine rerank columns on the winners."""
    emb = _with_norm(_emb(spark, sf_dir))
    cb = _codebook_staged(spark, sf_dir, emb)
    if not cb[0]:  # empty table → no codebook; empty result, not a crash
        return spark.createDataFrame([], _PQ_EMPTY_SCHEMA)
    cb_lit = _cb_lit(cb)

    # codes side = the session-staged IVF-PQ index (everything except
    # the q157 new batch, already encoded with the identical expressions)
    # plus the new-batch slice encoded per call — q68's r12 pattern;
    # re-encoding the whole corpus per call repeated the index's work
    index = ivfpq_index(spark, sf_dir)
    codes = index.select("vec_id", "codes").unionByName(
        emb.filter(_is_new_batch(F.col("vec_id"))).select(
            "vec_id", _codes_expr(F.col("v"), cb_lit).alias("codes")
        )
    )

    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        _lut_expr(F.col("v"), cb_lit).alias("lut"),
    )

    # ADC: codes-only scoring (the raw vector never enters this join);
    # project to (qid, vec_id, adc_raw) BEFORE the rank exchange (guide
    # §2.3) — qv/qn re-attach to the top-k winners only, below
    adc = _adc_expr()
    w = Window.partitionBy("qid").orderBy(F.col("adc_raw").desc(), F.col("vec_id"))
    top = (
        codes.join(F.broadcast(queries), F.col("vec_id") != F.col("qid"))
        .withColumn("adc_raw", adc)
        .select("qid", "vec_id", "adc_raw")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOP_K)
    )

    # exact-cosine rerank columns for the winners only
    rerank = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    exact = top.join(emb.select("vec_id", "v", "nrm"), "vec_id").join(
        F.broadcast(rerank), "qid"
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    return exact.select(
        "qid",
        "rn",
        F.col("vec_id").alias("neighbor_id"),
        F.round(F.col("adc_raw"), 4).alias("adc_dot"),
        F.round(cos, 4).alias("cosine"),
    )


_SUBD = "(cb.m - 1) * 8"
_Q59_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
n AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS nrm
  FROM e
),
cbv AS (SELECT vec_id AS c, v FROM e WHERE vec_id < {CW}),
cb AS (
  SELECT m, c, v[(m - 1) * {SUB} + 1 : (m - 1) * {SUB} + {SUB}] AS sub
  FROM cbv, unnest(range(1, {M} + 1)) AS t(m)
),
enc AS (
  SELECT e.vec_id, cb.m, cb.c,
         row_number() OVER (
           PARTITION BY e.vec_id, cb.m
           ORDER BY list_sum(list_transform(range(1, {SUB} + 1),
             i -> (e.v[{_SUBD} + i] - cb.sub[i]) * (e.v[{_SUBD} + i] - cb.sub[i]))),
             cb.c) AS rn
  FROM e, cb
),
codes AS (SELECT vec_id, m, c AS code FROM enc WHERE rn = 1),
q AS (SELECT vec_id AS qid, v, nrm FROM n WHERE vec_id % 100 = 0),
lut AS (
  SELECT q.qid, cb.m, cb.c,
         list_sum(list_transform(range(1, {SUB} + 1),
           i -> q.v[{_SUBD} + i] * cb.sub[i])) AS dp
  FROM q, cb
),
scored AS (
  SELECT l.qid, cd.vec_id AS neighbor_id,
         list_sum(list(l.dp ORDER BY l.m)) AS adc_raw
  FROM codes cd
  JOIN lut l ON l.m = cd.m AND l.c = cd.code AND cd.vec_id != l.qid
  GROUP BY l.qid, cd.vec_id
),
ranked AS (
  SELECT qid, neighbor_id, adc_raw,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_raw DESC, neighbor_id) AS rn
  FROM scored
),
top AS (SELECT * FROM ranked WHERE rn <= {PQ_TOP_K})
SELECT t.qid, t.rn, t.neighbor_id,
       round(t.adc_raw, 4) AS adc_dot,
       round(list_sum(list_transform(range(1, len(q.v) + 1),
               i -> q.v[i] * b.v[i])) / (q.nrm * b.nrm), 4) AS cosine
FROM top t
JOIN q ON q.qid = t.qid
JOIN n b ON b.vec_id = t.neighbor_id
"""


def q60_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform int8 quantization round-trip: per-dimension min/max →
    8-bit encode → decode → per-dimension reconstruction-error report.
    One explode, one 64-group agg, a 64-row broadcast join back, one
    final agg — no UDF, no collect."""
    emb = _emb(spark, sf_dir)
    x = emb.select("vec_id", F.posexplode("v").alias("pos0", "x"))
    stats = x.groupBy("pos0").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.lit(255.0),
            F.greatest(F.lit(0.0), F.round((F.col("x") - F.col("mn")) / scale, 0)),
        ),
    ).otherwise(F.lit(0.0))
    enc = (
        x.join(F.broadcast(stats), "pos0")
        .withColumn("code", code)
        .withColumn("decoded", F.col("mn") + F.col("code") * scale)
        .withColumn("err", F.abs(F.col("x") - F.col("decoded")))
    )
    return enc.groupBy("pos0").agg(
        F.count("*").alias("n_values"),
        F.round(F.first("mn"), 6).alias("qmin"),
        F.round(F.first("mx"), 6).alias("qmax"),
        F.round(F.max("err"), 6).alias("max_abs_err"),
        F.round(F.avg("err"), 6).alias("avg_abs_err"),
    ).select(
        (F.col("pos0") + 1).cast("int").alias("pos"),
        "n_values",
        "qmin",
        "qmax",
        "max_abs_err",
        "avg_abs_err",
    )


_Q60_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
x AS (
  SELECT vec_id, pos, v[pos] AS x
  FROM e, unnest(range(1, len(v) + 1)) AS t(pos)
),
s AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM x GROUP BY pos),
enc AS (
  SELECT x.pos, x.x, s.mn, s.mx,
         CASE WHEN s.mx > s.mn
              THEN least(255.0, greatest(0.0,
                     round((x.x - s.mn) / ((s.mx - s.mn) / 255.0))))
              ELSE 0.0 END AS code
  FROM x JOIN s USING (pos)
),
dec AS (
  SELECT pos, mn, mx,
         abs(x - (mn + code * ((mx - mn) / 255.0))) AS err
  FROM enc
)
SELECT CAST(pos AS INTEGER) AS pos,
       count(*) AS n_values,
       round(min(mn), 6) AS qmin,
       round(min(mx), 6) AS qmax,
       round(max(err), 6) AS max_abs_err,
       round(avg(err), 6) AS avg_abs_err
FROM dec GROUP BY pos
"""

def q68_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN layout (FAISS's default): the coarse
    quantizer (q33's 16 cells) prunes candidates to nprobe=2 cells via an
    EQUI-join on the cell id (partition-prunable at scale, unlike q59's
    whole-table nested loop), and scoring inside the probed cells touches
    only the 8-byte PQ codes against the broadcast query LUTs; the exact
    cosine reranks the top-k winners.  At 100 TB the table is stored
    partitioned by cell with a codes column — a query reads nprobe/16 of
    the codes, ~64× smaller than the vectors."""
    from postfix_log_parser_spark.ext.similarity import _cell_scores

    emb = _with_norm(_emb(spark, sf_dir))
    cb = _codebook_staged(spark, sf_dir, emb)
    if not cb[0]:  # empty table → no codebook; empty result, not a crash
        return spark.createDataFrame([], _PQ_EMPTY_SCHEMA)
    cb_lit = _cb_lit(cb)
    base = emb.withColumn("cs", _cell_scores(F.col("v")))
    cell = (F.array_position(F.col("cs"), F.array_max("cs")) - 1).cast("int")
    base = base.withColumn("cell", cell)

    # candidate side = the session-staged IVF-PQ index (shared with
    # q157/q159 — built once per session, the production daily mode)
    # plus the one slice it excludes (the q157 "new batch",
    # vec_id ≡ 50 mod 100) encoded per call with the IDENTICAL cell +
    # codes expressions — bit-for-bit the old full re-encode (r12;
    # re-encoding the whole corpus per call was 3 of q68's ~2.7 s and
    # exactly the work the persisted-index story says never repeats)
    index = ivfpq_index(spark, sf_dir)
    cand = index.unionByName(
        base.filter(_is_new_batch(F.col("vec_id"))).select(
            "vec_id", "cell", _codes_expr(F.col("v"), cb_lit).alias("codes")
        )
    )

    masked = F.transform(
        F.col("cs"),
        lambda x, i: F.when(i == F.col("cell"), F.lit(float("-inf"))).otherwise(x),
    )
    p2 = (F.array_position(masked, F.array_max(masked)) - 1).cast("int")
    q = base.filter(F.col("vec_id") % 100 == 0).withColumn("p2", p2)
    # the probe side carries only what the ADC join needs (lut + cells);
    # qv/qn re-attach to the top-k winners below (guide §2.3 — without
    # the split every candidate row ships the 64-dim query vector
    # through the rank Exchange)
    queries = q.select(
        F.col("vec_id").alias("qid"),
        _lut_expr(F.col("v"), cb_lit).alias("lut"),
        F.explode(F.array(F.col("cell"), F.col("p2"))).alias("probe_cell"),
    )

    w = Window.partitionBy("qid").orderBy(F.col("adc_raw").desc(), F.col("vec_id"))
    top = (
        cand.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("qid")),
        )
        .withColumn("adc_raw", _adc_expr())
        .select("qid", "vec_id", "adc_raw")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOP_K)
    )
    rerank = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    exact = top.join(emb.select("vec_id", "v", "nrm"), "vec_id").join(
        F.broadcast(rerank), "qid"
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    return exact.select(
        "qid",
        "rn",
        F.col("vec_id").alias("neighbor_id"),
        F.round(F.col("adc_raw"), 4).alias("adc_dot"),
        F.round(cos, 4).alias("cosine"),
    )


def _q68_sql() -> str:
    from postfix_log_parser_spark.ext.similarity import CENTROIDS

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
n AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS nrm,
         {score} AS cs
  FROM e, cfg
),
cells AS (
  SELECT vec_id, v, nrm, cs,
         CAST(list_position(cs, list_max(cs)) - 1 AS INTEGER) AS cell
  FROM n
),
q0 AS (
  SELECT vec_id AS qid, v, nrm, cell AS p1,
         CAST(list_position(cs, list_max(list_transform(range(1, len(cs) + 1),
              j -> CASE WHEN j - 1 = cell THEN '-infinity'::DOUBLE
                        ELSE cs[j] END))) - 1 AS INTEGER) AS p2
  FROM cells WHERE vec_id % 100 = 0
),
probes AS (SELECT qid, unnest([p1, p2]) AS probe_cell FROM q0),
cbv AS (SELECT vec_id AS c, v FROM e WHERE vec_id < {CW}),
cb AS (
  SELECT m, c, v[(m - 1) * {SUB} + 1 : (m - 1) * {SUB} + {SUB}] AS sub
  FROM cbv, unnest(range(1, {M} + 1)) AS t(m)
),
enc AS (
  SELECT e.vec_id, cb.m, cb.c,
         row_number() OVER (
           PARTITION BY e.vec_id, cb.m
           ORDER BY list_sum(list_transform(range(1, {SUB} + 1),
             i -> (e.v[{_SUBD} + i] - cb.sub[i]) * (e.v[{_SUBD} + i] - cb.sub[i]))),
             cb.c) AS rn
  FROM e, cb
),
codes AS (SELECT vec_id, m, c AS code FROM enc WHERE rn = 1),
lut AS (
  SELECT q0.qid, cb.m, cb.c,
         list_sum(list_transform(range(1, {SUB} + 1),
           i -> q0.v[{_SUBD} + i] * cb.sub[i])) AS dp
  FROM q0, cb
),
candpairs AS (
  SELECT p.qid, c.vec_id
  FROM probes p JOIN cells c ON c.cell = p.probe_cell AND c.vec_id != p.qid
),
adc AS (
  SELECT cp.qid, cp.vec_id AS neighbor_id,
         list_sum(list(l.dp ORDER BY l.m)) AS adc_raw
  FROM candpairs cp
  JOIN codes cd ON cd.vec_id = cp.vec_id
  JOIN lut l ON l.qid = cp.qid AND l.m = cd.m AND l.c = cd.code
  GROUP BY cp.qid, cp.vec_id
),
ranked AS (
  SELECT qid, neighbor_id, adc_raw,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_raw DESC, neighbor_id) AS rn
  FROM adc
),
top AS (SELECT * FROM ranked WHERE rn <= {PQ_TOP_K})
SELECT t.qid, t.rn, t.neighbor_id,
       round(t.adc_raw, 4) AS adc_dot,
       round(list_sum(list_transform(range(1, len(q0.v) + 1),
               i -> q0.v[i] * b.v[i])) / (q0.nrm * b.nrm), 4) AS cosine
FROM top t
JOIN q0 ON q0.qid = t.qid
JOIN cells b ON b.vec_id = t.neighbor_id
"""


# ---------------------------------------------------------------------------
# q157 — incremental ANN: new vectors vs the PERSISTED IVF-PQ index
# ---------------------------------------------------------------------------

NEW_BATCH_MOD = 100
NEW_BATCH_RESIDUE = 50  # disjoint from q68's query set (vec_id % 100 == 0)

# persisted-index stage, keyed per (SparkContext, sf_dir) — the same
# staging pattern as the dedup pair list (ext/dedup.py): the OPERATIONAL
# daily mode never rebuilds the index for a new ingest batch, it probes
# the one already written.  The staged frame holds ONLY (vec_id, cell,
# codes) — the 8-byte-code working set, ~64× smaller than the vectors.
_IVF_STAGE = StageCache(inputs=("embeddings.parquet",))
IVF_STAGE_COMPUTES = {"n": 0}


def _is_new_batch(vec_id: Column) -> Column:
    return vec_id % NEW_BATCH_MOD == NEW_BATCH_RESIDUE


def ivfpq_index(spark: SparkSession, sf_dir: str):
    """The persisted IVF-PQ index over the CORPUS side (everything except
    the new batch): (vec_id, cell, codes), eagerly materialized once per
    (session, sf_dir).  At 100 TB this is a table partitioned by cell
    with a binary codes column; localCheckpoint is the local-mode twin.
    Returns None when the corpus has no codebook rows (empty input)."""
    from postfix_log_parser_spark.ext.similarity import _cell_scores

    key = _IVF_STAGE.key(spark, sf_dir)
    staged = _IVF_STAGE.get(key)
    if staged is not None:
        return staged
    emb = _with_norm(_emb(spark, sf_dir))
    cb = _codebook_staged(spark, sf_dir, emb)
    if not cb[0]:
        # never cache the miss: a corpus that is empty at first touch may
        # gain data later (the fingerprint key would change too, but a
        # same-mtime edge shouldn't pin q157 to typed-empty for a session)
        return None
    IVF_STAGE_COMPUTES["n"] += 1
    cb_lit = _cb_lit(cb)
    base = emb.filter(~_is_new_batch(F.col("vec_id"))).withColumn(
        "cs", _cell_scores(F.col("v"))
    )
    cell = (F.array_position(F.col("cs"), F.array_max("cs")) - 1).cast("int")
    index = base.select(
        "vec_id",
        cell.alias("cell"),
        _codes_expr(F.col("v"), cb_lit).alias("codes"),
    ).localCheckpoint(eager=True)
    return _IVF_STAGE.put(key, index)


def q157_ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN — q69's asymmetric new-batch shape applied to
    similarity search: a small ingest batch of NEW vectors (vec_id ≡ 50
    mod 100 plays the daily delta) is searched against the PERSISTED
    IVF-PQ index (``ivfpq_index``) with NO index rebuild.  Each new
    vector computes its own nprobe=2 coarse cells and ADC lookup tables;
    candidates come from the broadcast equi-join of the (tiny) new batch
    against the index's cell partitions, scoring touches only the stored
    8-byte codes, and the exact cosine reranks the top-k by joining the
    winners back to the vector table.

    Scale shape (100 TB): the index side is a cell-partitioned codes
    table read once per batch (nprobe/16 of it after pruning); the new
    batch broadcasts; nothing re-encodes the corpus.  The plan is pinned
    in tests/test_plans.py: index side = checkpoint scan (no re-encode),
    one BroadcastHashJoin on the probe cell."""
    index = ivfpq_index(spark, sf_dir)
    if index is None:
        return spark.createDataFrame(
            [], "new_id long, rn int, neighbor_id long, adc_dot double, cosine double"
        )
    emb = _with_norm(_emb(spark, sf_dir))
    return probe_ivfpq(index, emb, _cb_lit(_codebook_staged(spark, sf_dir, emb)))


def new_batch_queries(emb: DataFrame, cb_lit: Column) -> DataFrame:
    """The probe side shared by q157 and the stream-maintained index
    (q176): each NEW-batch vector computes its own top-2 coarse cells
    (nprobe=2) and ADC lookup table — all tiny and broadcastable."""
    from postfix_log_parser_spark.ext.similarity import _cell_scores

    newv = emb.filter(_is_new_batch(F.col("vec_id"))).withColumn(
        "cs", _cell_scores(F.col("v"))
    )
    cell = (F.array_position(F.col("cs"), F.array_max("cs")) - 1).cast("int")
    newv = newv.withColumn("cell", cell)
    masked = F.transform(
        F.col("cs"),
        lambda x, i: F.when(i == F.col("cell"), F.lit(float("-inf"))).otherwise(x),
    )
    p2 = (F.array_position(masked, F.array_max(masked)) - 1).cast("int")
    return newv.withColumn("p2", p2).select(
        F.col("vec_id").alias("new_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        _lut_expr(F.col("v"), cb_lit).alias("lut"),
        F.explode(F.array(F.col("cell"), F.col("p2"))).alias("probe_cell"),
    )


def probe_ivfpq(index: DataFrame, emb: DataFrame, cb_lit: Column) -> DataFrame:
    """ADC probe of a (vec_id, cell, codes) index by the new-batch query
    set, exact-cosine rerank on the winners — q157's search, callable
    against ANY index representation (the staged session frame or
    q176's stream-maintained cell-partitioned table)."""
    # probe side sheds qv/qn before the ADC join — the rank Exchange
    # carries (new_id, vec_id, adc_raw) only; winners re-attach the query
    # vector via a broadcast join (guide §2.3)
    queries = new_batch_queries(emb, cb_lit).select(
        "new_id", "lut", "probe_cell"
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("adc_raw").desc(), F.col("vec_id")
    )
    top = (
        index.join(F.broadcast(queries), F.col("cell") == F.col("probe_cell"))
        .withColumn("adc_raw", _adc_expr())
        .select("new_id", "vec_id", "adc_raw")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOP_K)
    )
    rerank = emb.filter(_is_new_batch(F.col("vec_id"))).select(
        F.col("vec_id").alias("new_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    exact = top.join(emb.select("vec_id", "v", "nrm"), "vec_id").join(
        F.broadcast(rerank), "new_id"
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    return exact.select(
        "new_id",
        "rn",
        F.col("vec_id").alias("neighbor_id"),
        F.round(F.col("adc_raw"), 4).alias("adc_dot"),
        F.round(cos, 4).alias("cosine"),
    )


def _q157_sql(index_extra_where: str = "") -> str:
    """q157's from-scratch IVF-PQ rebuild + probe.  ``index_extra_where``
    narrows the INDEX side only (candidate cells) — q177 uses it to
    express a takedown (deleted ids excluded from the store, queries
    unaffected)."""
    from postfix_log_parser_spark.ext.similarity import CENTROIDS

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
n AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS nrm,
         {score} AS cs
  FROM e, cfg
),
cells AS (
  SELECT vec_id, v, nrm, cs,
         CAST(list_position(cs, list_max(cs)) - 1 AS INTEGER) AS cell
  FROM n
),
q0 AS (
  SELECT vec_id AS new_id, v, nrm, cell AS p1,
         CAST(list_position(cs, list_max(list_transform(range(1, len(cs) + 1),
              j -> CASE WHEN j - 1 = cell THEN '-infinity'::DOUBLE
                        ELSE cs[j] END))) - 1 AS INTEGER) AS p2
  FROM cells WHERE vec_id % {NEW_BATCH_MOD} = {NEW_BATCH_RESIDUE}
),
probes AS (SELECT new_id, unnest([p1, p2]) AS probe_cell FROM q0),
cbv AS (SELECT vec_id AS c, v FROM e WHERE vec_id < {CW}),
cb AS (
  SELECT m, c, v[(m - 1) * {SUB} + 1 : (m - 1) * {SUB} + {SUB}] AS sub
  FROM cbv, unnest(range(1, {M} + 1)) AS t(m)
),
enc AS (
  SELECT e.vec_id, cb.m, cb.c,
         row_number() OVER (
           PARTITION BY e.vec_id, cb.m
           ORDER BY list_sum(list_transform(range(1, {SUB} + 1),
             i -> (e.v[{_SUBD} + i] - cb.sub[i]) * (e.v[{_SUBD} + i] - cb.sub[i]))),
             cb.c) AS rn
  FROM e, cb
  WHERE e.vec_id % {NEW_BATCH_MOD} != {NEW_BATCH_RESIDUE}
),
codes AS (SELECT vec_id, m, c AS code FROM enc WHERE rn = 1),
lut AS (
  SELECT q0.new_id, cb.m, cb.c,
         list_sum(list_transform(range(1, {SUB} + 1),
           i -> q0.v[{_SUBD} + i] * cb.sub[i])) AS dp
  FROM q0, cb
),
candpairs AS (
  SELECT p.new_id, c.vec_id
  FROM probes p JOIN cells c
    ON c.cell = p.probe_cell
   AND c.vec_id % {NEW_BATCH_MOD} != {NEW_BATCH_RESIDUE}{index_extra_where}
),
adc AS (
  SELECT cp.new_id, cp.vec_id AS neighbor_id,
         list_sum(list(l.dp ORDER BY l.m)) AS adc_raw
  FROM candpairs cp
  JOIN codes cd ON cd.vec_id = cp.vec_id
  JOIN lut l ON l.new_id = cp.new_id AND l.m = cd.m AND l.c = cd.code
  GROUP BY cp.new_id, cp.vec_id
),
ranked AS (
  SELECT new_id, neighbor_id, adc_raw,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY adc_raw DESC, neighbor_id) AS rn
  FROM adc
),
top AS (SELECT * FROM ranked WHERE rn <= {PQ_TOP_K})
SELECT t.new_id, t.rn, t.neighbor_id,
       round(t.adc_raw, 4) AS adc_dot,
       round(list_sum(list_transform(range(1, len(q0.v) + 1),
               i -> q0.v[i] * b.v[i])) / (q0.nrm * b.nrm), 4) AS cosine
FROM top t
JOIN q0 ON q0.new_id = t.new_id
JOIN cells b ON b.vec_id = t.neighbor_id
"""


QUANTIZE_QUERIES = {
    "q59_ann_pq": q59_ann_pq,
    "q60_int8_quant": q60_int8_quant,
    "q68_ann_ivfpq": q68_ann_ivfpq,
    "q157_ann_incremental": q157_ann_incremental,
}
QUANTIZE_ORACLES = {
    "q59_ann_pq": _Q59_SQL,
    "q60_int8_quant": _Q60_SQL,
    "q68_ann_ivfpq": _q68_sql(),
    "q157_ann_incremental": _q157_sql(),
}


# ---------------------------------------------------------------------------
# q159 — IVF-PQ recall audit (measure the ANN loss, don't guess it)
# ---------------------------------------------------------------------------

def q159_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does q68's nprobe=2 IVF-PQ actually miss?  q25 is the
    exact brute-force cosine top-k over the same vectors, so its top
    ``PQ_TOP_K`` rows are the ground truth; q68's neighbor set is the
    approximate answer, and the overlap IS the recall@k — the same
    measure-don't-guess audit q132 runs for the LSH dedup banding.
    Production tunes (nprobe, M, CW) against this number instead of
    trusting the quantization-error analysis.

    Output: one row — n_queries, k, n_exact, n_approx, n_hits, recall.

    Scale shape: both arms are the already-bucketed pipelines; the audit
    join is keyed on the (qid, neighbor_id) pair — K rows per query.  At
    100 TB this runs on a sampled query set; recall concentrates fast
    because (query, rank) pairs are the unit."""
    from postfix_log_parser_spark.ext.similarity import q25_ann_bruteforce

    exact = (
        q25_ann_bruteforce(spark, sf_dir)
        .filter(F.col("rn") <= PQ_TOP_K)
        .select("qid", "neighbor_id", F.lit(1).alias("in_exact"))
    )
    approx = q68_ann_ivfpq(spark, sf_dir).select(
        "qid", "neighbor_id", F.lit(1).alias("in_approx")
    )
    j = exact.join(approx, ["qid", "neighbor_id"], "full_outer")
    n_exact = F.sum(F.coalesce("in_exact", F.lit(0)))
    n_approx = F.sum(F.coalesce("in_approx", F.lit(0)))
    n_hits = F.sum(
        F.when(
            F.col("in_exact").isNotNull() & F.col("in_approx").isNotNull(), 1
        ).otherwise(0)
    )
    return j.agg(
        F.count_distinct("qid").cast("long").alias("n_queries"),
        F.lit(PQ_TOP_K).cast("long").alias("k"),
        n_exact.cast("long").alias("n_exact"),
        n_approx.cast("long").alias("n_approx"),
        n_hits.cast("long").alias("n_hits"),
        F.round(
            F.try_divide(n_hits, F.nullif(n_exact, F.lit(0))), 4
        ).alias("recall"),
    )


def _q159_sql() -> str:
    from postfix_log_parser_spark.ext.similarity import _Q25_SQL

    return f"""
WITH exact_full AS ({_Q25_SQL}),
exact AS (
  SELECT qid, neighbor_id, 1 AS in_exact
  FROM exact_full WHERE rn <= {PQ_TOP_K}
),
approx AS (
  SELECT qid, neighbor_id, 1 AS in_approx FROM ({_q68_sql()})
),
j AS (
  SELECT coalesce(e.qid, a.qid) AS qid,
         e.in_exact, a.in_approx
  FROM exact e
  FULL OUTER JOIN approx a
    ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
)
SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
       CAST({PQ_TOP_K} AS BIGINT) AS k,
       CAST(sum(coalesce(in_exact, 0)) AS BIGINT) AS n_exact,
       CAST(sum(coalesce(in_approx, 0)) AS BIGINT) AS n_approx,
       CAST(sum(CASE WHEN in_exact = 1 AND in_approx = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       round(sum(CASE WHEN in_exact = 1 AND in_approx = 1 THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(sum(coalesce(in_exact, 0)), 0), 4) AS recall
FROM j
"""


QUANTIZE_QUERIES["q159_ann_recall"] = q159_ann_recall
QUANTIZE_ORACLES["q159_ann_recall"] = _q159_sql()
