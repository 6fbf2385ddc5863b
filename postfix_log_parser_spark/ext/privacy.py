"""Privacy-audit operators for training-data release gates.

``q48_pii_mask`` (logquery.py) rewrites PII out of event payloads; this
module answers the complementary release question: after masking, can a
row still be re-identified from its *quasi-identifiers*?  The standard
audit is k-anonymity (every QI equivalence class holds >= k records) and
l-diversity (each class spans >= l distinct sensitive values, so class
membership does not reveal the sensitive attribute).

Scale shape: one scan, no windows, no joins, no collect.  The exact
distinct-sensitive count makes Catalyst plan TWO keyed exchanges — a
partial-distinct aggregate keyed on (QI, user) collapses duplicates
map-side before the QI-keyed final — which is the textbook exact
count-distinct shape; swap ``countDistinct`` for
``approx_count_distinct`` to fold it back to one exchange when the
audit tolerates HLL error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K_ANON = 5   # minimum equivalence-class size
L_DIV = 3    # minimum distinct sensitive values per class


def q133_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the events table.

    Quasi-identifiers: (event_type, hour-of-day, value band of width 10)
    — the generalized columns a release would publish.  Sensitive
    attribute: user_id.  One row per QI equivalence class with its size,
    its l-diversity, and the release verdict ``risky`` (class smaller
    than K_ANON or sensitive diversity below L_DIV).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    qi = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hour_of_day"),
        F.floor(F.col("value") / 10).cast("long").alias("value_band"),
        "user_id",
    )
    return (
        qi.groupBy("event_type", "hour_of_day", "value_band")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("user_id").alias("l_div"),
        )
        .withColumn(
            "risky",
            (F.col("class_size") < K_ANON) | (F.col("l_div") < L_DIV),
        )
    )


_Q133_SQL = f"""
SELECT event_type,
       CAST(hour(ts) AS BIGINT) AS hour_of_day,
       CAST(floor(value / 10) AS BIGINT) AS value_band,
       CAST(count(*) AS BIGINT) AS class_size,
       CAST(count(DISTINCT user_id) AS BIGINT) AS l_div,
       (count(*) < {K_ANON} OR count(DISTINCT user_id) < {L_DIV}) AS risky
FROM events
GROUP BY 1, 2, 3
"""


PRIVACY_QUERIES = {"q133_kanonymity": q133_kanonymity}
PRIVACY_ORACLES = {"q133_kanonymity": _Q133_SQL}
