"""Tokenizer vocabulary coverage / OOV-rate audit (q144).

Before committing to a tokenizer vocabulary, a corpus pipeline measures
what the candidate vocab actually covers: per source, how many token
occurrences fall outside the top-V vocabulary (OOV), and how many
distinct OOV types there are.  A source with a high OOV rate is either
noise (drop it) or a domain the vocab must grow toward — either way the
number drives the decision, per-corpus, before training.

Scale shape (100 TB): ONE corpus scan + explode produces the
(source, word) → count aggregate (single hash exchange, collapsed
map-side); the vocabulary is derived from that same aggregate by
re-aggregating over word (second small exchange over distinct words,
NOT the corpus) and taking the top-V with ties broken alphabetically —
V is a constant, so the sort is a bounded TakeOrdered, and the vocab
rides back onto the per-source counts as a broadcast join.  The corpus
is never scanned twice and no row-level data reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.dedup import words_of

VOCAB_SIZE = 30


def q144_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source coverage report: (source, n_tokens, n_oov, oov_rate,
    n_oov_types) against the corpus-global top-``VOCAB_SIZE`` vocab
    (frequency desc, word asc on ties)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", F.explode(words_of(F.col("text"))).alias("word"))
    )
    # the (source, word) aggregate feeds BOTH the vocab derivation and
    # the coverage join; without an explicit materialization Spark plans
    # two full corpus scans (ReuseExchange does not fire across the
    # extra aggregate level).  The aggregate is vocab-sized — orders of
    # magnitude smaller than the corpus — so a lazy localCheckpoint
    # (materialized once at first action, lineage truncated) is the
    # production call at 100 TB: one scan, one tiny cached table.
    ws = (
        docs.groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        ws.groupBy("word")
        .agg(F.sum("n").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(VOCAB_SIZE)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    marked = ws.join(F.broadcast(vocab), "word", "left")
    oov = F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(F.lit(0))
    return (
        marked.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov_types"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("n_oov").cast("double") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("oov_rate"),
            "n_oov_types",
        )
    )


_Q144_SQL = f"""
WITH tok AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''))
         AS word
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
ws AS (SELECT source, word, count(*) AS n FROM tok GROUP BY source, word),
vocab AS (
  SELECT word FROM (
    SELECT word, sum(n) AS freq FROM ws GROUP BY word
  ) ORDER BY freq DESC, word LIMIT {VOCAB_SIZE}
),
marked AS (
  SELECT ws.source, ws.n,
         CASE WHEN v.word IS NULL THEN ws.n ELSE 0 END AS oov_n,
         CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov_t
  FROM ws LEFT JOIN vocab v USING (word)
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(oov_n) AS BIGINT) AS n_oov,
       round(CASE WHEN sum(n) > 0
                  THEN sum(oov_n)::DOUBLE / sum(n) ELSE 0.0 END, 4)
         AS oov_rate,
       CAST(sum(oov_t) AS BIGINT) AS n_oov_types
FROM marked GROUP BY source
"""


VOCAB_QUERIES = {"q144_vocab_oov": q144_vocab_oov}
VOCAB_ORACLES = {"q144_vocab_oov": _Q144_SQL}
