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


CORPUS_QUERIES = {
    "q83_train_split": q83_train_split,
    "q84_context_chunks": q84_context_chunks,
    "q85_source_diversity": q85_source_diversity,
}

CORPUS_ORACLES = {
    "q83_train_split": _Q83_SQL,
    "q84_context_chunks": _Q84_SQL,
    "q85_source_diversity": _Q85_SQL,
}
