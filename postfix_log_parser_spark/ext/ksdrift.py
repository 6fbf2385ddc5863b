"""Exact two-sample Kolmogorov-Smirnov drift test (q149).

q129's PSI compares binned histograms — it needs bucket edges chosen up
front and is blind to drift inside a bucket.  The KS statistic
``D = sup_x |F_a(x) - F_b(x)|`` is the bin-free complement: exact, rank
based, and the standard gate for "did this corpus shift?" between two
snapshots.  Snapshots here are the q121/q122 convention: doc_id parity
over the documents table; the tested statistic is the per-doc mean word
length (a float quality proxy), ROUNDED to 3 dp so the distinct-value
domain is bounded and both engines feed identical sets.

Scale shape (100 TB): per-value counts collapse each snapshot map-side
(one hash exchange over DISTINCT rounded values, not docs); the
empirical CDFs are cumulative sums over that distinct-value table — a
global-ordered window over |distinct values| rows (bounded by the
rounding: ≤ a few thousand), NEVER over the corpus.  The sup and the
summary verdict are a 1-row aggregate.  This is the same
"corpus → bounded statistic table → tiny window" shape as q87/q108.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.ext.dedup import words_of

_ROUND = 3
_ALPHA_C = 1.358  # c(alpha) for alpha = 0.05 (two-sided asymptotic)


def q149_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row verdict: (n_a, n_b, ks_stat, ks_crit, drifted) — exact D
    between the even-doc_id and odd-doc_id snapshots' mean-word-length
    distributions, against the 5% asymptotic critical value."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", words_of(F.col("text")).alias("w"))
        .filter(F.size("w") > 0)
    )
    awl = F.round(
        F.aggregate(
            F.col("w"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / F.size("w"),
        _ROUND,
    )
    vals = docs.select(
        (F.col("doc_id") % 2 == 0).alias("is_a"), awl.alias("v")
    )
    counts = vals.groupBy("v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("cb"),
    )
    by_v = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cdf = counts.select(
        (
            F.sum("ca").over(by_v).cast("double")
            / F.sum("ca").over(tot)
        ).alias("fa"),
        (
            F.sum("cb").over(by_v).cast("double")
            / F.sum("cb").over(tot)
        ).alias("fb"),
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
    )
    d = F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6)
    crit = F.round(
        F.lit(_ALPHA_C)
        * F.sqrt(
            (F.max("n_a") + F.max("n_b")).cast("double")
            / (F.max("n_a").cast("double") * F.max("n_b"))
        ),
        6,
    )
    return cdf.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        d.alias("ks_stat"),
        crit.alias("ks_crit"),
        (d > crit).alias("drifted"),
    )


_Q149_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS w
  FROM documents WHERE text IS NOT NULL
),
vals AS (
  SELECT doc_id % 2 = 0 AS is_a,
         round(list_sum(list_transform(w, x -> length(x)))::DOUBLE
               / len(w), {_ROUND}) AS v
  FROM docs WHERE len(w) > 0
),
counts AS (
  SELECT v,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
  FROM vals GROUP BY v
),
cdf AS (
  SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)::DOUBLE
           / sum(ca) OVER () AS fa,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)::DOUBLE
           / sum(cb) OVER () AS fb,
         sum(ca) OVER () AS n_a,
         sum(cb) OVER () AS n_b
  FROM counts
)
SELECT CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       round(max(abs(fa - fb)), 6) AS ks_stat,
       round({_ALPHA_C} * sqrt((max(n_a) + max(n_b))::DOUBLE
             / (max(n_a)::DOUBLE * max(n_b))), 6) AS ks_crit,
       round(max(abs(fa - fb)), 6)
         > round({_ALPHA_C} * sqrt((max(n_a) + max(n_b))::DOUBLE
                 / (max(n_a)::DOUBLE * max(n_b))), 6) AS drifted
FROM cdf
"""


KSDRIFT_QUERIES = {"q149_ks_drift": q149_ks_drift}
KSDRIFT_ORACLES = {"q149_ks_drift": _Q149_SQL}
