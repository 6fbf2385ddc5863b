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


# ---------------------------------------------------------------------------
# q148 — APPLIED BPE: learn M merges, tokenize the corpus with them
# ---------------------------------------------------------------------------

N_MERGES = 8


def _merge_fold(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) inside a symbol
    array — a pure Catalyst ``aggregate`` fold (no Python): the
    accumulator replaces its last element with a+b whenever (last,
    current) == (a, b), which is exactly the non-overlapping semantics
    BPE training used when it counted the pair."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def q148_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn ``N_MERGES`` BPE merges on the corpus, apply them, report.

    Training is q82's verified primitive iterated: each round counts
    adjacent symbol pairs over the DISTINCT-word table weighted by
    occurrence count (the corpus is never re-scanned: distinct words ≪
    corpus at any scale), takes the top pair — (count desc, pair asc),
    deterministic — with a 1-row bounded collect, and rewrites the
    symbol arrays with a Catalyst fold.  Each round localCheckpoints
    the small word table so round k never recomputes rounds 1..k-1.
    Application is the same fold, so tokenization matches training
    state exactly.  Learning stops early when no pair repeats.

    The learned merge table is data-dependent, so token counts are not
    SQL-expressible: the contract is SELF-VERIFYING (q15 pattern) —
    exact per-source word/distinct-word counts plus invariant booleans
    the oracle asserts as literal TRUE (every token sequence
    concatenates back to its word; token count within [1, len(word)];
    merging never increases token count).

    Output: (source, n_words, n_distinct_words, roundtrip_ok,
    tokens_bounded, tokens_le_chars).
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    occurrences = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    ).filter(
        F.col("word").rlike("^[a-z]+$")
        & (F.length("word") >= 1)
        & (F.length("word") <= MAX_WORD_LEN)
    )
    # ONE corpus scan: the (source, word) aggregate feeds both the
    # training table (re-agg over word) and the final report (q144's
    # checkpoint-sharing shape)
    sw = (
        occurrences.groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt_sw"))
        .localCheckpoint(eager=False)
    )
    wc = (
        sw.groupBy("word")
        .agg(F.sum("cnt_sw").alias("cnt"))
        .withColumn(
            "syms", F.expr("filter(split(word, ''), s -> s != '')")
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(N_MERGES):
        # pairs are (left, right) SYMBOL structs, never concatenated
        # strings — "ab"+"a" and "a"+"ba" must not conflate
        pair_counts = (
            # single-symbol words carry no pairs — and sequence(1, 0)
            # would generate a DESCENDING [1, 0] index pair, not empty
            wc.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i ->"
                        " struct(element_at(syms, i) AS a,"
                        " element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not pair_counts or pair_counts[0]["n"] < 2:
            break
        a, b = pair_counts[0]["a"], pair_counts[0]["b"]
        wc = wc.withColumn(
            "syms", _merge_fold(F.col("syms"), a, b)
        ).localCheckpoint(eager=False)
    tok = wc.select(
        "word",
        F.size("syms").alias("n_tok"),
        (F.concat_ws("", F.col("syms")) == F.col("word")).alias("ok"),
        F.size("syms").between(1, F.length("word")).alias("bounded"),
        (F.size("syms") <= F.length("word")).alias("le_chars"),
    )
    return (
        sw.join(tok, "word")
        .groupBy("source")
        .agg(
            F.sum("cnt_sw").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.min("ok").alias("roundtrip_ok"),
            F.min("bounded").alias("tokens_bounded"),
            F.min("le_chars").alias("tokens_le_chars"),
        )
    )


_Q148_SQL = f"""
WITH words AS (
  SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
eligible AS (
  SELECT source, word FROM words
  WHERE regexp_full_match(word, '[a-z]+')
    AND length(word) BETWEEN 1 AND {MAX_WORD_LEN}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words,
       TRUE AS roundtrip_ok,
       TRUE AS tokens_bounded,
       TRUE AS tokens_le_chars
FROM eligible GROUP BY source
"""


BPE_QUERIES = {
    "q82_bpe_pair_counts": q82_bpe_pair_counts,
    "q148_bpe_tokenize": q148_bpe_tokenize,
}

BPE_ORACLES = {
    "q82_bpe_pair_counts": _Q82_SQL,
    "q148_bpe_tokenize": _Q148_SQL,
}
