"""Tokenizer-induction statistics — BPE merge-candidate pair counts.

Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) is driven
by one distributed primitive repeated per merge round: count adjacent
symbol pairs across the corpus and take the most frequent.  That count
is the expensive part at 100 TB — the merge itself is a driver-side
table update — so the engine exposes it as a first-class operator.

Shape: lowercase → whitespace tokenize → per-word adjacent character
pairs via ``transform(sequence(...))`` (pure Catalyst, no Python) →
explode → hash aggregate → top-k with ``orderBy().limit()`` so Spark
plans TakeOrderedAndProject (per-partition heaps), never a
single-partition global Window.

Scale notes: the explode fan-out is bounded by word length (words capped
at 20 chars); the pair-count agg has tiny key cardinality (≤ ~26² for
the a-z filter here, ≤ 2¹⁶ pairs for a real byte-level vocab), so
map-side partial aggregation collapses every partition before the one
exchange — counters travel, text doesn't.  Iterating merge rounds reuses
this operator on a re-paired corpus (documented; a single round is the
verified primitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.analytics import load

TOP_K = 20
MAX_WORD_LEN = 20


def q82_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs over ``documents`` (one BPE round).

    Output: (pair, cnt), the merge candidates ranked by frequency with a
    deterministic lexicographic tie-break.
    """
    docs = load(spark, sf_dir, "documents").select("text")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(
        F.col("word").rlike("^[a-z]+$")
        & (F.length("word") >= 2)
        & (F.length("word") <= MAX_WORD_LEN)
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("pair")).limit(TOP_K)


_Q82_SQL = f"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents
),
eligible AS (
  SELECT word FROM words
  WHERE regexp_full_match(word, '[a-z]+')
    AND length(word) BETWEEN 2 AND {MAX_WORD_LEN}
),
pairs AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair
  FROM (
    SELECT word, unnest(generate_series(1, length(word) - 1)) AS i
    FROM eligible
  )
)
SELECT pair, count(*) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {TOP_K}
"""


BPE_QUERIES = {
    "q82_bpe_pair_counts": q82_bpe_pair_counts,
}

BPE_ORACLES = {
    "q82_bpe_pair_counts": _Q82_SQL,
}
