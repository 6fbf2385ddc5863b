"""Quality-filter cascade with per-rule attrition accounting (q141).

Every production corpus pipeline runs an ORDERED battery of cheap
heuristic gates (Gopher/C4-style rules) and must report *attrition*:
how many documents reached each rule and how many it dropped — the
first failing rule owns the drop, later rules never see the document.
The per-rule drop attribution is what q27's flat quality metrics can't
express: re-ordering the cascade changes every downstream count, so the
report has to model the sequence, not the set.

Scale shape (100 TB): one scan computes the per-doc metrics inside the
projection (all JVM-side builtins — no UDF), the first-failing rule is
a constant-folded CASE chain, and the attrition report is a group-by on
a 5-value key collapsed map-side; the cumulative "n_reached" pass runs
on the 5-row rule dimension, never on the corpus.  Rules with zero
drops still report (left join against the literal rule table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.ext.dedup import words_of

# (rule, threshold doc) — calibrated so every rule bites on the synthetic
# corpus; the SHAPE (ordered first-fail attribution) is the operator.
MIN_WORDS = 12        # r1: too short to carry signal
MIN_ALPHA_RATIO = 0.805   # r2: too much non-letter noise
MIN_UNIQ_RATIO = 0.30     # r3: repetition (distinct/total words)
WLEN_LO, WLEN_HI = 4.0, 5.1  # r4: mean word length out of natural band

_RULES = (
    ("r1_min_words", 1),
    ("r2_alpha_ratio", 2),
    ("r3_repetition", 3),
    ("r4_word_len", 4),
    ("survived", 5),
)


def q141_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attrition report: (rule, rule_order, n_reached, n_dropped,
    drop_rate) — one row per rule plus the terminal ``survived`` row
    (n_reached = survivors, n_dropped = 0)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    w = words_of(F.col("text"))
    n_words = F.size(w)
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
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
    first_fail = (
        F.when((n_words < MIN_WORDS) | n_words.isNull(), "r1_min_words")
        .when(alpha_ratio < MIN_ALPHA_RATIO, "r2_alpha_ratio")
        .when(uniq_ratio < MIN_UNIQ_RATIO, "r3_repetition")
        .when((awl < WLEN_LO) | (awl > WLEN_HI), "r4_word_len")
        .otherwise("survived")
    )
    counts = docs.select(first_fail.alias("rule")).groupBy("rule").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    rules = spark.createDataFrame(list(_RULES), "rule string, rule_order int")
    per_rule = (
        rules.join(counts, "rule", "left")
        .select(
            "rule", "rule_order",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    # n_reached(rule) = total - drops by STRICTLY earlier rules; runs on
    # the 5-row rule dimension (single-partition window is fine there)
    cum = Window.orderBy("rule_order").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = Window.partitionBy()
    n_reached = (
        F.sum("n_hit").over(total) - F.coalesce(F.sum("n_hit").over(cum), F.lit(0))
    )
    return per_rule.select(
        "rule",
        "rule_order",
        n_reached.cast("long").alias("n_reached"),
        F.when(F.col("rule") == "survived", F.lit(0))
        .otherwise(F.col("n_hit")).cast("long").alias("n_dropped"),
        F.round(
            F.when(F.col("rule") == "survived", F.lit(0.0)).otherwise(
                F.when(
                    n_reached > 0, F.col("n_hit").cast("double") / n_reached
                ).otherwise(F.lit(0.0))
            ),
            4,
        ).alias("drop_rate"),
    ).orderBy("rule_order")


_Q141_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS words,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
  FROM documents WHERE text IS NOT NULL
), m AS (
  SELECT len(words) AS n_words,
         CASE WHEN n_chars > 0 THEN n_alpha::DOUBLE / n_chars END AS alpha_ratio,
         CASE WHEN len(words) > 0
              THEN len(list_distinct(words))::DOUBLE / len(words) END AS uniq_ratio,
         CASE WHEN len(words) > 0
              THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE
                   / len(words) END AS awl
  FROM w
), ff AS (
  SELECT CASE
    WHEN n_words < {MIN_WORDS} OR n_words IS NULL THEN 'r1_min_words'
    WHEN alpha_ratio < {MIN_ALPHA_RATIO} THEN 'r2_alpha_ratio'
    WHEN uniq_ratio < {MIN_UNIQ_RATIO} THEN 'r3_repetition'
    WHEN awl < {WLEN_LO} OR awl > {WLEN_HI} THEN 'r4_word_len'
    ELSE 'survived' END AS rule
  FROM m
), counts AS (
  SELECT r.rule, r.rule_order, CAST(coalesce(c.n_hit, 0) AS BIGINT) AS n_hit
  FROM (VALUES ('r1_min_words', 1), ('r2_alpha_ratio', 2),
               ('r3_repetition', 3), ('r4_word_len', 4),
               ('survived', 5)) AS r(rule, rule_order)
  LEFT JOIN (SELECT rule, count(*) AS n_hit FROM ff GROUP BY rule) c
    USING (rule)
)
SELECT rule, rule_order,
       CAST(sum(n_hit) OVER ()
            - coalesce(sum(n_hit) OVER (ORDER BY rule_order
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS n_reached,
       CAST(CASE WHEN rule = 'survived' THEN 0 ELSE n_hit END AS BIGINT)
         AS n_dropped,
       round(CASE WHEN rule = 'survived' THEN 0.0
                  WHEN (sum(n_hit) OVER ()
                        - coalesce(sum(n_hit) OVER (ORDER BY rule_order
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) > 0
                  THEN n_hit::DOUBLE
                       / (sum(n_hit) OVER ()
                          - coalesce(sum(n_hit) OVER (ORDER BY rule_order
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                  ELSE 0.0 END, 4) AS drop_rate
FROM counts ORDER BY rule_order
"""


CASCADE_QUERIES = {"q141_filter_cascade": q141_filter_cascade}
CASCADE_ORACLES = {"q141_filter_cascade": _Q141_SQL}
