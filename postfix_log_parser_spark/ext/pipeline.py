"""End-to-end curation pipeline composition (q146).

The individual curation operators (q143 canonicalization, q141 filter
cascade, q20-style exact dedup, q29 token accounting) each pass their
own oracle; a user of the engine runs them CHAINED.  q146 is that
chain as ONE declarative plan — documents → NFC canonical form →
cascade survivors → exact dedup on the canonical hash (min-doc_id
winner) → per-source attrition/yield report — proving the operators
compose without materialization boundaries and that Catalyst plans the
whole pipeline as a single scan.

Scale shape (100 TB): one corpus scan computes the canonical text (the
scoped Arrow NFC stage), every cascade metric, and the content hash
inside the projection; the only exchanges are (1) the dedup window
keyed on the canonical hash — state bounded by duplicate-group size —
and (2) the final per-source aggregate.  Nothing is collected, nothing
is re-scanned; stage counts are conditional aggregates over one pass,
the way a production pipeline reports yield without running four jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.ext.cascade import (
    MIN_ALPHA_RATIO,
    MIN_UNIQ_RATIO,
    MIN_WORDS,
    WLEN_HI,
    WLEN_LO,
)
from postfix_log_parser_spark.ext.dedup import words_of
from postfix_log_parser_spark.ext.normalize import _augment, _nfc, _ZERO_WIDTH_RE


def q146_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source yield report across the chained pipeline:
    (source, n_raw, n_changed, n_survivors, n_kept, n_tokens_kept,
    yield_rate) — n_changed counts canonicalization rewrites, n_kept is
    post-dedup (exact, canonical-hash, min-doc_id winner, attributed to
    the WINNER's source), yield_rate = n_kept / n_raw."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select(
            "doc_id",
            "source",
            _augment(F.col("text"), F.col("doc_id")).alias("raw"),
        )
    )
    norm = F.regexp_replace(_nfc(F.col("raw")), _ZERO_WIDTH_RE, "")
    canon = docs.select(
        "doc_id", "source", norm.alias("canon"), (norm != F.col("raw")).alias("changed")
    )
    w = words_of(F.col("canon"))
    n_words = F.size(w)
    n_chars = F.length("canon")
    n_alpha = F.length(F.regexp_replace("canon", "[^a-zA-Z]", ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars)
    uniq_ratio = F.when(
        n_words > 0, F.size(F.array_distinct(w)).cast("double") / n_words
    )
    awl = F.when(
        n_words > 0,
        F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double") / n_words,
    )
    survived = (
        (n_words >= MIN_WORDS)
        & (alpha_ratio >= MIN_ALPHA_RATIO)
        & (uniq_ratio >= MIN_UNIQ_RATIO)
        & awl.between(WLEN_LO, WLEN_HI)
    )
    staged = canon.select(
        "doc_id",
        "source",
        "changed",
        F.coalesce(survived, F.lit(False)).alias("survived"),
        n_words.cast("long").alias("n_tokens"),
        F.md5(F.col("canon").cast("binary")).alias("canon_md5"),
    )
    # dedup among survivors only: min-doc_id winner per canonical hash;
    # non-survivors get rank NULL (they never reach the dedup stage)
    ranked = staged.withColumn(
        "rk",
        F.when(
            F.col("survived"),
            F.row_number().over(
                Window.partitionBy("canon_md5", "survived").orderBy("doc_id")
            ),
        ),
    )
    kept = F.col("survived") & (F.col("rk") == 1)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.sum(F.col("changed").cast("int")).cast("long").alias("n_changed"),
            F.sum(F.col("survived").cast("int")).cast("long").alias("n_survivors"),
            F.sum(kept.cast("int")).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_tokens_kept"),
        )
        .select(
            "source",
            "n_raw",
            "n_changed",
            "n_survivors",
            "n_kept",
            "n_tokens_kept",
            F.round(
                F.when(
                    F.col("n_raw") > 0,
                    F.col("n_kept").cast("double") / F.col("n_raw"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("yield_rate"),
        )
    )


_Q146_SQL = f"""
WITH aug AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN chr(8203) ELSE '' END ||
         CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769) || ' ' ELSE '' END ||
         text ||
         CASE WHEN doc_id % 5 = 0 THEN ' A' || chr(778) ELSE '' END AS raw
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
canon AS (
  SELECT doc_id, source,
         regexp_replace(nfc_normalize(raw),
                        '[\\x{{200B}}\\x{{200C}}\\x{{200D}}\\x{{FEFF}}]',
                        '', 'g') AS canon,
         regexp_replace(nfc_normalize(raw),
                        '[\\x{{200B}}\\x{{200C}}\\x{{200D}}\\x{{FEFF}}]',
                        '', 'g') != raw AS changed
  FROM aug
),
m AS (
  SELECT doc_id, source, changed, canon,
         list_filter(string_split_regex(lower(canon), '[^a-z0-9]+'),
                     x -> x != '') AS words,
         length(canon) AS n_chars,
         length(regexp_replace(canon, '[^a-zA-Z]', '', 'g')) AS n_alpha
  FROM canon
),
staged AS (
  SELECT doc_id, source, changed,
         coalesce(
           len(words) >= {MIN_WORDS}
           AND (CASE WHEN n_chars > 0
                     THEN n_alpha::DOUBLE / n_chars END) >= {MIN_ALPHA_RATIO}
           AND (CASE WHEN len(words) > 0
                     THEN len(list_distinct(words))::DOUBLE / len(words) END)
               >= {MIN_UNIQ_RATIO}
           AND (CASE WHEN len(words) > 0
                     THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE
                          / len(words) END) BETWEEN {WLEN_LO} AND {WLEN_HI},
           FALSE) AS survived,
         CAST(len(words) AS BIGINT) AS n_tokens,
         md5(canon) AS canon_md5
  FROM m
),
ranked AS (
  SELECT *, CASE WHEN survived THEN
           row_number() OVER (PARTITION BY canon_md5, survived
                              ORDER BY doc_id) END AS rk
  FROM staged
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN survived THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(sum(CASE WHEN survived AND rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN survived AND rk = 1 THEN n_tokens ELSE 0 END)
         AS BIGINT) AS n_tokens_kept,
       round(CASE WHEN count(*) > 0
                  THEN sum(CASE WHEN survived AND rk = 1 THEN 1 ELSE 0 END)::DOUBLE
                       / count(*) ELSE 0.0 END, 4) AS yield_rate
FROM ranked GROUP BY source
"""


# ---------------------------------------------------------------------------
# q150 — the same curation chain under Structured Streaming
# ---------------------------------------------------------------------------

def q150_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q146's canonicalize → cascade → dedup chain run INCREMENTALLY:
    documents arrive as a file stream, the NFC pandas UDF and every
    cascade metric evaluate per micro-batch, and ``dropDuplicates`` on
    the canonical hash carries the dedup decision ACROSS batches in the
    state store — the shape a continuously-ingesting corpus pipeline
    runs.  Emits only the canonical hash (the surviving-document key
    set), so the emitted set is deterministic regardless of which
    duplicate arrives first; over availableNow it equals the batch
    DISTINCT the oracle computes.

    State note (100 TB): plain ``dropDuplicates`` state grows with
    distinct content — the production bound is q95's
    ``dropDuplicatesWithinWatermark`` once documents carry an ingest
    timestamp; documents.parquet has none, so the unbounded variant is
    the honest demo and the bound is documented here.
    """
    from postfix_log_parser_spark.logquery import _run_stream_to_memory

    # maxFilesPerTrigger=1: each arriving file is its own micro-batch,
    # so the dedup state is genuinely exercised ACROSS batches (on the
    # single-file driver testdata this is a no-op)
    src = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sf_dir}/documents.parque[t]")
    )
    docs = src.filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    ).select(
        "doc_id", _augment(F.col("text"), F.col("doc_id")).alias("raw")
    )
    canon = F.regexp_replace(_nfc(F.col("raw")), _ZERO_WIDTH_RE, "")
    staged = docs.select(canon.alias("canon"))
    w = words_of(F.col("canon"))
    n_words = F.size(w)
    n_chars = F.length("canon")
    n_alpha = F.length(F.regexp_replace("canon", "[^a-zA-Z]", ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars)
    uniq_ratio = F.when(
        n_words > 0, F.size(F.array_distinct(w)).cast("double") / n_words
    )
    awl = F.when(
        n_words > 0,
        F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double") / n_words,
    )
    survived = (
        (n_words >= MIN_WORDS)
        & (alpha_ratio >= MIN_ALPHA_RATIO)
        & (uniq_ratio >= MIN_UNIQ_RATIO)
        & awl.between(WLEN_LO, WLEN_HI)
    )
    out = (
        staged.filter(F.coalesce(survived, F.lit(False)))
        .select(F.md5(F.col("canon").cast("binary")).alias("canon_md5"))
        .dropDuplicates(["canon_md5"])
    )
    return _run_stream_to_memory(
        spark, out, "q150", source_path=f"{sf_dir}/documents.parquet"
    )


_Q150_SQL = f"""
WITH aug AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN chr(8203) ELSE '' END ||
         CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769) || ' ' ELSE '' END ||
         text ||
         CASE WHEN doc_id % 5 = 0 THEN ' A' || chr(778) ELSE '' END AS raw
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
canon AS (
  SELECT regexp_replace(nfc_normalize(raw),
                        '[\\x{{200B}}\\x{{200C}}\\x{{200D}}\\x{{FEFF}}]',
                        '', 'g') AS canon
  FROM aug
),
m AS (
  SELECT canon,
         list_filter(string_split_regex(lower(canon), '[^a-z0-9]+'),
                     x -> x != '') AS words,
         length(canon) AS n_chars,
         length(regexp_replace(canon, '[^a-zA-Z]', '', 'g')) AS n_alpha
  FROM canon
)
SELECT DISTINCT md5(canon) AS canon_md5
FROM m
WHERE coalesce(
        len(words) >= {MIN_WORDS}
        AND (CASE WHEN n_chars > 0
                  THEN n_alpha::DOUBLE / n_chars END) >= {MIN_ALPHA_RATIO}
        AND (CASE WHEN len(words) > 0
                  THEN len(list_distinct(words))::DOUBLE / len(words) END)
            >= {MIN_UNIQ_RATIO}
        AND (CASE WHEN len(words) > 0
                  THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE
                       / len(words) END) BETWEEN {WLEN_LO} AND {WLEN_HI},
        FALSE)
"""


PIPELINE_QUERIES = {
    "q146_curation_pipeline": q146_curation_pipeline,
    "q150_stream_curation": q150_stream_curation,
}
PIPELINE_ORACLES = {
    "q146_curation_pipeline": _Q146_SQL,
    "q150_stream_curation": _Q150_SQL,
}
