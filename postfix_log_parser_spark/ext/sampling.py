"""Weighted sampling for training-data mixing (q62).

q62 — **weighted reservoir sample without replacement** (Efraimidis &
Spirakis A-ES, "Weighted random sampling with a reservoir", IPL 2006):
each document gets key ``u^(1/w)`` for a uniform ``u`` and weight ``w``;
the k largest keys ARE a weighted sample without replacement.  Ranking
by ``ln(u)/w`` is order-equivalent and numerically tamer.

Distributed shape: the key is a pure narrow expression, and top-k is
``orderBy().limit(k)`` — Spark's TakeOrderedAndProject, a per-partition
k-heap plus a k-row merge, NEVER a global sort.  That is exactly the
100 TB shape: one scan, O(k) driver/merge state.  The rank column is
re-derived by a window over the k surviving rows only (bounded, single
tiny partition by construction).

Determinism: ``u`` is md5-derived from doc_id (the portable hash the
dedup family already uses — bit-identical in Spark and DuckDB), so the
"random" sample is reproducible across runs, partitionings, AND engines;
weights are ``n_chars`` (longer docs proportionally likelier, the usual
token-budget-aware mix).  ``ln`` is evaluated on identical doubles in
both engines; adjacent keys are separated far beyond 1 ulp, so the
ranking is stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SAMPLE_K = 100


def weighted_sample(docs: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """A-ES weighted sample of ``k`` docs from any (doc_id, source,
    n_chars) frame — layout-independent because the key is a pure
    function of doc_id."""
    # portable uniform in (0,1): first 60 md5 bits mod 1e9, offset half a
    # bucket so u is never 0 (ln(0) = -inf)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    u = ((h % 1000000000).cast("double") + 0.5) / 1000000000.0
    key = F.log(u) / F.col("n_chars")
    top = (
        docs.withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("es_key").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).alias("sample_rank"), "doc_id", "source", "n_chars"
    )


def q62_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        # a zero/negative weight has zero selection probability in A-ES —
        # and would divide ln(u) by zero under ANSI mode
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars")
    )
    return weighted_sample(docs)


_Q62_SQL = f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1000000000) + 0.5) / 1000000000.0 AS u
  FROM documents WHERE n_chars > 0
),
k AS (SELECT doc_id, source, n_chars, ln(u) / n_chars AS es_key FROM d),
ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (ORDER BY es_key DESC, doc_id) AS sample_rank
  FROM k
)
SELECT sample_rank, doc_id, source, n_chars
FROM ranked WHERE sample_rank <= {SAMPLE_K}
"""

# ---------------------------------------------------------------------------
# q112 — temperature-based source mixing (corpus reweighting)
# ---------------------------------------------------------------------------
#
# The standard multilingual/multi-source training mix (GPT-3 / XLM-R style):
# sample source s with probability ∝ p_s^alpha instead of its natural share
# p_s, flattening the head and up-weighting the tail.  alpha = 0.5.
#
# Numerics contract: per-source weights are floor(sqrt(n_s) * 1e6) BIGINTs —
# sqrt is IEEE correctly-rounded (identical in JVM and DuckDB, unlike pow),
# and integer sums are order-independent — so every sampling rate is the
# same double in both engines and the md5-uniform keep decision (q62's
# portable hash) is bit-reproducible.  No float accumulates across rows.
#
# Scale shape: one tiny per-source aggregate (broadcast back), then a
# narrow per-row keep filter — one scan + one broadcast join, no shuffle
# of the corpus.

MIX_ALPHA_NOTE = "alpha=0.5 realized as integer-scaled sqrt weights"
MIX_TARGET_FRAC = 2  # sample ~N/2 docs overall


def q112_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars")
    )
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = per_src.withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs")) * 1000000).cast("long")
    )
    totals = weighted.agg(
        F.sum("w").alias("w_total"), F.sum("n_docs").alias("n_total")
    )
    rates = (
        weighted.join(F.broadcast(totals), how="cross")
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                (F.col("n_total") / MIX_TARGET_FRAC)
                * F.col("w")
                / (F.col("w_total") * F.col("n_docs")),
            ),
        )
        .select("source", "n_docs", "w", "rate")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = ((h % 1000000000).cast("double") + 0.5) / 1000000000.0
    kept = (
        docs.join(F.broadcast(rates), "source")
        .withColumn("u", u)
        .filter(F.col("u") < F.col("rate"))
    )
    return kept.groupBy("source").agg(
        F.max("n_docs").alias("n_docs"),
        F.max("w").alias("weight"),
        F.round(F.max("rate"), 6).alias("rate"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


_Q112_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs
  FROM documents WHERE n_chars > 0 GROUP BY source
),
weighted AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w
  FROM per_src
),
totals AS (
  SELECT CAST(sum(w) AS BIGINT) AS w_total,
         CAST(sum(n_docs) AS BIGINT) AS n_total
  FROM weighted
),
rates AS (
  SELECT source, n_docs, w,
         least(1.0, (n_total / {MIX_TARGET_FRAC}) * w / (w_total * n_docs))
           AS rate
  FROM weighted CROSS JOIN totals
),
kept AS (
  SELECT d.source, d.n_chars, r.n_docs, r.w, r.rate
  FROM (
    SELECT source, n_chars,
           ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 1000000000) + 0.5) / 1000000000.0 AS u
    FROM documents WHERE n_chars > 0
  ) d JOIN rates r USING (source)
  WHERE d.u < r.rate
)
SELECT source, max(n_docs) AS n_docs, max(w) AS weight,
       round(max(rate), 6) AS rate, count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM kept GROUP BY source
"""

# ---------------------------------------------------------------------------
# q117 — stratified eval-set draw with largest-remainder allocation
# ---------------------------------------------------------------------------
#
# Building a FIXED-SIZE eval set from a multi-source corpus needs two exact
# steps: (1) apportion exactly EVAL_N slots across strata proportionally —
# the Hamilton / largest-remainder method, all integer arithmetic
# (base_s = (EVAL_N*n_s)//N, remainder r_s = EVAL_N*n_s - base_s*N, the
# EVAL_N - Σbase leftover slots go to the largest remainders, ties on
# source asc) — and (2) draw each stratum's quota deterministically (md5
# order, the portable uniform), so reruns and engines agree row-for-row.
#
# Scale shape: the allocation works on the ~|strata|-row aggregate
# (broadcast back); the draw is one window shuffle keyed on source —
# rank-within-stratum, the same exchange any per-group top-n pays.

EVAL_N = 200


def q117_stratified_eval_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source")
    )
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_src.agg(F.sum("n_docs").alias("n_total"))
    base = (
        per_src.join(F.broadcast(tot), how="cross")
        .withColumn("base", F.expr(f"({EVAL_N} * n_docs) div n_total"))
        .withColumn(
            "rem",
            F.lit(EVAL_N) * F.col("n_docs") - F.col("base") * F.col("n_total"),
        )
    )
    leftover = base.agg(
        (F.lit(EVAL_N) - F.sum("base")).cast("long").alias("extra")
    )
    rem_rank = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("source"))
    )
    alloc = (
        base.join(F.broadcast(leftover), how="cross")
        .withColumn("rem_rank", rem_rank)
        .withColumn(
            "alloc",
            F.col("base")
            + F.when(F.col("rem_rank") <= F.col("extra"), 1).otherwise(0),
        )
        .select("source", "alloc")
    )
    u = F.md5(F.col("doc_id").cast("string"))
    draw_rank = F.row_number().over(
        Window.partitionBy("source").orderBy(u, F.col("doc_id"))
    )
    return (
        docs.join(F.broadcast(alloc), "source")
        .withColumn("draw_rank", draw_rank)
        .filter(F.col("draw_rank") <= F.col("alloc"))
        .select("source", "draw_rank", "doc_id")
    )


_Q117_SQL = f"""
WITH d AS (
  SELECT doc_id, source FROM documents WHERE text IS NOT NULL
),
per_src AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per_src),
base AS (
  SELECT source, n_docs,
         ({EVAL_N} * n_docs) // n_total AS base,
         {EVAL_N} * n_docs - (({EVAL_N} * n_docs) // n_total) * n_total AS rem
  FROM per_src CROSS JOIN tot
),
leftover AS (SELECT {EVAL_N} - CAST(sum(base) AS BIGINT) AS extra FROM base),
alloc AS (
  SELECT source,
         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                      <= (SELECT extra FROM leftover)
                THEN 1 ELSE 0 END AS alloc
  FROM base
),
ranked AS (
  SELECT d.source, d.doc_id, a.alloc,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
           AS draw_rank
  FROM d JOIN alloc a USING (source)
)
SELECT source, draw_rank, doc_id
FROM ranked WHERE draw_rank <= alloc
"""

SAMPLING_QUERIES = {
    "q62_weighted_sample": q62_weighted_sample,
    "q112_source_mix": q112_source_mix,
    "q117_stratified_eval_set": q117_stratified_eval_set,
}
SAMPLING_ORACLES = {
    "q62_weighted_sample": _Q62_SQL,
    "q112_source_mix": _Q112_SQL,
    "q117_stratified_eval_set": _Q117_SQL,
}
