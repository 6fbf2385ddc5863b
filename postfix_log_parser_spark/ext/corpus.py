"""Corpus-preparation operators — split assignment, context-window
chunking, diversity statistics.

Three more stages of the LLM-training-data pipeline, downstream of
dedup/quality and upstream of the export (``ext/export.py``):

* q83 — deterministic train/val/test split: every document is assigned
  a split from a portable md5-derived uniform draw (NOT ``rand()`` —
  the assignment must be reproducible across engines, re-runs, and
  repartitions, or eval contamination silently varies run to run).
  Pure predicate, zero extra shuffles beyond the verifying aggregate.
* q84 — context-window chunking with stride: each document's token
  sequence is cut into fixed-size overlapping windows (size 64, stride
  48), the standard packing-free way to fit long documents into a
  training context.  ``sequence()`` generates chunk starts on the
  aggregated (per-doc) side, ``slice()`` cuts token arrays — all
  Catalyst, fan-out proportional to output chunks, no Python.
* q85 — per-source diversity stats: token counts, distinct tokens, and
  Shannon word-entropy per corpus source, computed with the
  ``H = ln N − Σ c·ln c / N`` identity so the plan is two hash
  aggregations (word-level then source-level) with map-side partials —
  no per-source probability join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.analytics import load

SPLIT_TRAIN = 950  # /1000
SPLIT_VAL = 975  # /1000
CHUNK = 64
STRIDE = 48


def q83_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 95/2.5/2.5 split, verified per (lang, split).

    Output: (lang, split, n_docs, sum_chars, min_doc, max_doc).
    """
    docs = load(spark, sf_dir, "documents")
    draw = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
        % 1000
    )
    split = (
        F.when(draw < SPLIT_TRAIN, F.lit("train"))
        .when(draw < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_Q83_SQL = f"""
WITH assigned AS (
  SELECT lang, n_chars, doc_id,
         CASE
           WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
                < {SPLIT_TRAIN} THEN 'train'
           WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
                < {SPLIT_VAL} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT lang, split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM assigned
GROUP BY 1, 2
"""


def q84_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunks (size 64, stride 48) per doc.

    Output: one row per chunk (doc_id, chunk_idx, n_tok, chunk_hash) —
    the hash witnesses the exact token content without hauling text.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.col("text"), r"\s+"), lambda t: t != F.lit("")
        ).alias("toks"),
    ).withColumn("n", F.size("toks"))
    # chunk count: 1 window if n <= CHUNK, else 1 + ceil((n-CHUNK)/STRIDE)
    n_chunks = F.when(F.col("n") <= CHUNK, F.lit(1)).otherwise(
        F.lit(1)
        + F.ceil((F.col("n") - F.lit(CHUNK)) / F.lit(STRIDE)).cast("int")
    )
    chunks = (
        toks.filter(F.col("n") > 0)
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(
                F.col("toks"),
                F.col("chunk_idx") * F.lit(STRIDE) + F.lit(1),
                F.lit(CHUNK),
            ).alias("win"),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("win").alias("n_tok"),
        F.md5(F.concat_ws(" ", F.col("win"))).alias("chunk_hash"),
    )


_Q84_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) > 0
),
chunked AS (
  SELECT doc_id,
         unnest(generate_series(0,
           CASE WHEN n <= {CHUNK} THEN 0
                ELSE CAST(ceil((n - {CHUNK}) / {STRIDE}.0) AS BIGINT)
           END)) AS chunk_idx,
         toks, n
  FROM sized
)
SELECT doc_id, chunk_idx,
       len(list_slice(toks, chunk_idx * {STRIDE} + 1,
                      least(chunk_idx * {STRIDE} + {CHUNK}, n))) AS n_tok,
       md5(array_to_string(list_slice(toks, chunk_idx * {STRIDE} + 1,
                      least(chunk_idx * {STRIDE} + {CHUNK}, n)), ' '))
         AS chunk_hash
FROM chunked
"""


def q85_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token totals, distinct vocab, and Shannon entropy.

    Output: (source, n_tokens, n_distinct, entropy) with entropy in
    nats rounded to 6 digits (H = ln N − Σ c·ln c / N over word counts).
    """
    docs = load(spark, sf_dir, "documents").select("source", "text")
    words = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    wc = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    return wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
            6,
        ).alias("entropy"),
    )


_Q85_SQL = """
WITH words AS (
  SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
  FROM documents
),
wc AS (
  SELECT source, w, count(*) AS c
  FROM words
  WHERE regexp_full_match(w, '[a-z]+')
  GROUP BY 1, 2
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
FROM wc
GROUP BY source
"""


# ---------------------------------------------------------------------------
# q121 — corpus snapshot diff (content-hash CDC between corpus versions)
# ---------------------------------------------------------------------------
#
# Iterated corpus builds need to answer "what changed since the last
# snapshot?" without re-processing unchanged documents: the diff drives
# incremental dedup (q69), incremental index maintenance, and audit
# reporting.  Diff rule: FULL OUTER join the two snapshots on doc_id and
# compare md5(text) — added (only in v2), removed (only in v1), changed
# (hash differs), unchanged.
#
# v2 is derived deterministically from v1 in-query (no second testdata
# table): every 37th doc removed, every 11th surviving doc edited
# (suffix appended), plus a synthetic batch of brand-new docs.  Same
# derivation in the oracle, so the diff itself is what's verified.
#
# Scale shape: ONE full-outer hash join keyed on doc_id plus a map-side
# partial count — on a production layout both snapshots are written
# bucketed by doc_id (sinks.write_events_bucketed is the same pattern),
# making this a zero-exchange sort-merge; the aggregate output is
# |sources| × 4 rows.  Char deltas are exact integer arithmetic, summed
# as BIGINT on both engines.

def q121_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    v1 = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    kept = v1.filter(F.col("doc_id") % 37 != 0)
    v2 = kept.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.col("text"), F.lit(" [v2 revision]")),
        ).otherwise(F.col("text")).alias("text"),
        "source",
    ).unionAll(
        v1.filter(F.col("doc_id") % 53 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(
                F.lit("fresh crawl document "),
                (F.col("doc_id") + 300000).cast("string"),
            ).alias("text"),
            F.lit("fresh").alias("source"),
        )
    )
    a = v1.select(
        F.col("doc_id"), F.md5("text").alias("h1"),
        F.length("text").alias("len1"), F.col("source").alias("src1"),
    )
    b = v2.select(
        F.col("doc_id"), F.md5("text").alias("h2"),
        F.length("text").alias("len2"), F.col("source").alias("src2"),
    )
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") == F.col("h2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce("src2", "src1").alias("source"),
            status.alias("status"),
            (F.coalesce("len2", F.lit(0)) - F.coalesce("len1", F.lit(0)))
            .cast("long").alias("char_delta"),
        )
        .groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("char_delta").alias("chars_delta"),
        )
    )


_Q121_SQL = """
WITH v1 AS (SELECT doc_id, text, source FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' [v2 revision]' ELSE text END AS text,
         source
  FROM v1 WHERE doc_id % 37 != 0
  UNION ALL
  SELECT doc_id + 300000 AS doc_id,
         'fresh crawl document ' || CAST(doc_id + 300000 AS VARCHAR) AS text,
         'fresh' AS source
  FROM v1 WHERE doc_id % 53 = 0
),
j AS (
  SELECT coalesce(b.source, a.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
              ELSE 'changed' END AS status,
         coalesce(length(b.text), 0) - coalesce(length(a.text), 0) AS char_delta
  FROM v1 a FULL OUTER JOIN v2 b USING (doc_id)
)
SELECT source, status, count(*) AS n_docs,
       CAST(sum(char_delta) AS BIGINT) AS chars_delta
FROM j GROUP BY source, status
"""


# ---------------------------------------------------------------------------
# q127 — dedup-aware dataset card (effective size per source)
# ---------------------------------------------------------------------------
#
# Dataset cards report raw vs EFFECTIVE size: how much of a source
# survives exact dedup, and what the duplication inflation factor is —
# the number that decides epoch counts and mixing weights.  Unique
# tokens are attributed to the FIRST occurrence (min doc_id per content
# hash), so per-source numbers sum to the global unique total with no
# double counting across sources.
#
# Scale shape: one hash aggregate on md5(text) with min_by (map-side
# partials), then a per-source aggregate — two exchanges total, both on
# small keys; token counts are integer sums (BIGINT both engines).

def q127_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text", "source")
    )
    tokens = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    raw = docs.select(
        "doc_id", "source", tokens.alias("n_tok"), F.md5("text").alias("h")
    )
    per_src_raw = raw.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_raw"),
        F.sum("n_tok").alias("n_tokens_raw"),
    )
    canon = (
        raw.groupBy("h")
        .agg(F.min_by(F.struct("doc_id", "source", "n_tok"), "doc_id").alias("d"))
        .select("d.source", "d.n_tok")
    )
    per_src_uniq = canon.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_unique"),
        F.sum("n_tok").alias("n_tokens_unique"),
    )
    return (
        per_src_raw.join(per_src_uniq, "source", "left")
        .select(
            "source",
            "n_docs_raw",
            "n_tokens_raw",
            F.coalesce("n_docs_unique", F.lit(0)).alias("n_docs_unique"),
            F.coalesce("n_tokens_unique", F.lit(0)).alias("n_tokens_unique"),
            # NULL (not inf/error) when a source owns zero canonical docs
            F.round(
                F.try_divide(
                    F.col("n_tokens_raw"),
                    F.nullif(
                        F.coalesce(F.col("n_tokens_unique"), F.lit(0)), F.lit(0)
                    ),
                ),
                4,
            ).alias("inflation"),
        )
    )


_Q127_SQL = """
WITH d AS (
  SELECT doc_id, source, text,
         len(string_split_regex(trim(text), '\\s+')) AS n_tok
  FROM documents WHERE text IS NOT NULL
),
raw AS (
  SELECT source, count(*) AS n_docs_raw,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens_raw
  FROM d GROUP BY source
),
canon AS (
  SELECT arg_min(source, doc_id) AS source, arg_min(n_tok, doc_id) AS n_tok
  FROM d GROUP BY md5(text)
),
uniq AS (
  SELECT source, count(*) AS n_docs_unique,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens_unique
  FROM canon GROUP BY source
)
SELECT r.source, r.n_docs_raw, r.n_tokens_raw,
       coalesce(u.n_docs_unique, 0) AS n_docs_unique,
       coalesce(u.n_tokens_unique, 0) AS n_tokens_unique,
       round(r.n_tokens_raw::DOUBLE / NULLIF(coalesce(u.n_tokens_unique, 0), 0), 4)
         AS inflation
FROM raw r LEFT JOIN uniq u USING (source)
"""


# ---------------------------------------------------------------------------
# q129 — corpus drift monitor (per-bucket PSI between snapshots)
# ---------------------------------------------------------------------------
#
# Before swapping a new corpus snapshot into training, pipelines gate on
# distribution drift — the standard scalar is the Population Stability
# Index over a bucketed feature: PSI_b = (p_b − q_b)·ln(p_b/q_b), summed
# over buckets, with add-one smoothing so empty buckets stay finite.
# Here the feature is document length (10 fixed 64-char buckets, last
# open-ended) and the snapshots are q121's v1/v2 derivation.
#
# Numerics: each bucket's term is computed from four INTEGERS
# (n_b, N per side) through the same double expression in both engines —
# no cross-row float accumulation (the per-bucket rows ARE the output;
# the scalar PSI is their sum, left to the consumer precisely because a
# 10-term float sum is evaluation-order-dependent).
#
# Scale shape: two narrow bucket projections + one tiny (≤10-key)
# aggregate each + a 10-row join — the corpus is scanned once per side,
# nothing else moves.

def q129_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    v1 = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()).select(
        "doc_id", "text", "source"
    )
    kept = v1.filter(F.col("doc_id") % 37 != 0)
    v2 = kept.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.col("text"), F.lit(" [v2 revision]")),
        ).otherwise(F.col("text")).alias("text"),
    ).unionAll(
        v1.filter(F.col("doc_id") % 53 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(
                F.lit("fresh crawl document "),
                (F.col("doc_id") + 300000).cast("string"),
            ).alias("text"),
        )
    )
    bucket = F.least(F.floor(F.length("text") / 64), F.lit(9)).cast("int")

    def counts(df, n_col):
        return df.select(bucket.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(n_col)
        )

    c1, c2 = counts(v1, "n_v1"), counts(v2, "n_v2")
    buckets = spark.range(10).select(F.col("id").cast("int").alias("bucket"))
    j = (
        buckets.join(c1, "bucket", "left")
        .join(c2, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_v1", F.lit(0)).alias("n_v1"),
            F.coalesce("n_v2", F.lit(0)).alias("n_v2"),
        )
    )
    # totals come from the 10-row bucket frame itself (an unpartitioned
    # window over exactly 10 rows) — no second scan of either snapshot
    from pyspark.sql.window import Window

    all_rows = Window.partitionBy()
    t1 = F.sum("n_v1").over(all_rows)
    t2 = F.sum("n_v2").over(all_rows)
    p = (F.col("n_v1") + 1) / (t1 + 10).cast("double")
    q = (F.col("n_v2") + 1) / (t2 + 10).cast("double")
    return j.select(
        "bucket",
        "n_v1",
        "n_v2",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


_Q129_SQL = """
WITH v1 AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' [v2 revision]' ELSE text END AS text
  FROM v1 WHERE doc_id % 37 != 0
  UNION ALL
  SELECT doc_id + 300000 AS doc_id,
         'fresh crawl document ' || CAST(doc_id + 300000 AS VARCHAR) AS text
  FROM v1 WHERE doc_id % 53 = 0
),
c1 AS (
  SELECT least(length(text) // 64, 9) AS bucket, count(*) AS n_v1
  FROM v1 GROUP BY 1
),
c2 AS (
  SELECT least(length(text) // 64, 9) AS bucket, count(*) AS n_v2
  FROM v2 GROUP BY 1
),
j AS (
  SELECT b.bucket,
         coalesce(c1.n_v1, 0) AS n_v1,
         coalesce(c2.n_v2, 0) AS n_v2,
         sum(coalesce(c1.n_v1, 0)) OVER () AS t1,
         sum(coalesce(c2.n_v2, 0)) OVER () AS t2
  FROM (SELECT unnest(range(0, 10)) AS bucket) b
  LEFT JOIN c1 ON c1.bucket = b.bucket
  LEFT JOIN c2 ON c2.bucket = b.bucket
)
SELECT CAST(bucket AS INTEGER) AS bucket, n_v1, n_v2,
       round(((n_v1 + 1) / CAST(t1 + 10 AS DOUBLE)
              - (n_v2 + 1) / CAST(t2 + 10 AS DOUBLE))
             * ln(((n_v1 + 1) / CAST(t1 + 10 AS DOUBLE))
                  / ((n_v2 + 1) / CAST(t2 + 10 AS DOUBLE))), 6) AS psi_term
FROM j
"""


CORPUS_QUERIES = {
    "q127_dataset_card": q127_dataset_card,
    "q129_drift_psi": q129_drift_psi,
    "q83_train_split": q83_train_split,
    "q84_context_chunks": q84_context_chunks,
    "q85_source_diversity": q85_source_diversity,
    "q121_corpus_diff": q121_corpus_diff,
}

CORPUS_ORACLES = {
    "q127_dataset_card": _Q127_SQL,
    "q129_drift_psi": _Q129_SQL,
    "q83_train_split": _Q83_SQL,
    "q84_context_chunks": _Q84_SQL,
    "q85_source_diversity": _Q85_SQL,
    "q121_corpus_diff": _Q121_SQL,
}
