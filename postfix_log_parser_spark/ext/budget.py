"""Token-budget mixture allocation (q156).

q37/q112 compute mixture WEIGHTS; an actual training run has a token
BUDGET, and the curation step is a greedy fill: rank sources by a
quality proxy, take whole sources while they fit, take a partial slice
of the boundary source, drop the rest.  The allocation table — who got
in, who was truncated, at what cumulative cost — is the artifact a
data-mix review signs off on.

All-integer arithmetic (token counts, cumulative sums, budget = 50% of
corpus tokens via integer division) so both engines produce the
identical table bit-for-bit.

Scale shape (100 TB): one corpus scan collapses to a per-source
aggregate (|sources| rows); the greedy fill is a cumulative-sum window
over that tiny dimension — the single-partition window is bounded by
the source count, never the corpus (same shape as q141's rule pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.ext.dedup import words_of

BUDGET_NUM, BUDGET_DEN = 1, 2  # budget = floor(total_tokens / 2)


def q156_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy allocation table: (source, rnk, n_tokens, tokens_taken,
    alloc) with alloc in {'full', 'partial', 'none'}.  Rank = quality
    proxy (distinct words desc, then source asc — deterministic)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", F.explode(words_of(F.col("text"))).alias("word"))
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("word").cast("long").alias("n_distinct"),
    )
    by_quality = Window.orderBy(F.col("n_distinct").desc(), F.col("source"))
    prev_cum = F.coalesce(
        F.sum("n_tokens").over(
            Window.orderBy(F.col("n_distinct").desc(), F.col("source"))
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    total = Window.partitionBy()
    # explicit floor: bare cast-to-long TRUNCATES in Spark but DuckDB's
    # CAST(double AS BIGINT) ROUNDS — floor() agrees in both engines
    budget = F.floor(
        F.sum("n_tokens").over(total) * BUDGET_NUM / BUDGET_DEN
    ).cast("long")
    taken = F.greatest(
        F.lit(0), F.least(F.col("n_tokens"), budget - prev_cum)
    )
    return per_source.select(
        "source",
        F.row_number().over(by_quality).cast("long").alias("rnk"),
        "n_tokens",
        taken.cast("long").alias("tokens_taken"),
        F.when(taken == F.col("n_tokens"), "full")
        .when(taken > 0, "partial")
        .otherwise("none")
        .alias("alloc"),
    )


_Q156_SQL = f"""
WITH tok AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''))
         AS word
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT word) AS BIGINT) AS n_distinct
  FROM tok GROUP BY source
),
alloc AS (
  SELECT source, n_tokens,
         row_number() OVER w AS rnk,
         coalesce(sum(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS prev_cum,
         CAST(floor(sum(n_tokens) OVER () * {BUDGET_NUM} * 1.0
                    / {BUDGET_DEN}) AS BIGINT) AS budget
  FROM per_source
  WINDOW w AS (ORDER BY n_distinct DESC, source)
)
SELECT source, CAST(rnk AS BIGINT) AS rnk, n_tokens,
       CAST(greatest(0, least(n_tokens, budget - prev_cum)) AS BIGINT)
         AS tokens_taken,
       CASE WHEN greatest(0, least(n_tokens, budget - prev_cum)) = n_tokens
            THEN 'full'
            WHEN greatest(0, least(n_tokens, budget - prev_cum)) > 0
            THEN 'partial'
            ELSE 'none' END AS alloc
FROM alloc
"""


BUDGET_QUERIES = {"q156_token_budget": q156_token_budget}
BUDGET_ORACLES = {"q156_token_budget": _Q156_SQL}
