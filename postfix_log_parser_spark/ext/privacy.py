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


# ---------------------------------------------------------------------------
# q145 — differentially-private count release (bounded contribution +
# Laplace mechanism, deterministic seeded noise)
# ---------------------------------------------------------------------------

DP_CLAMP = 5      # per-(user, event_type) contribution bound C
DP_EPSILON = 1.0  # per-release privacy budget


def q145_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type count release under the Laplace mechanism.

    Release pipeline (Dwork et al., TCC'06 shape):

    1. **Contribution bounding** — each (user_id, event_type) pair
       contributes at most ``DP_CLAMP`` events (``least(count, C)``), so
       adding/removing one user-type pair moves the released count by at
       most C: sensitivity Δ = C.
    2. **Laplace noise** — scale b = Δ/ε added to the clamped sum via
       inverse-CDF: ``-b·sign(u-½)·ln(1-2|u-½|)``.

    Determinism contract — and what this query does NOT claim: the
    "draw" u is a portable md5-derived uniform of the PUBLIC release key
    (same 15-hex-digit trick as the CMS/KMV sketches), NOT an RNG, so
    reruns and the DuckDB oracle produce the identical release.  That
    makes this a demonstration of the mechanism's SHAPE (clamp →
    sensitivity bound → Laplace inverse-CDF), not a private release:
    deterministic per-key noise provides no fresh randomness across
    repeated or adaptive releases, so the ε-DP accounting does not
    apply to it — and the output deliberately carries ``true_count``
    next to ``dp_count`` precisely because it is an oracle-checkable
    demo, which any real release must never do.  A production release
    needs fresh (or at minimum per-release-secret-keyed, carefully
    argued) randomness, must drop ``true_count``/``noise``, and must
    track cumulative ε across releases.

    Scale shape (100 TB): two keyed exchanges — the clamp aggregate on
    (user, event_type) collapses map-side, the release aggregate on
    event_type is tiny; the noise is a constant-folded column
    expression.  This is the exact-count-distinct shape q133 documents,
    with a clamp instead of a distinct.
    """
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
    )
    clamped = (
        ev.groupBy("user_id", "event_type")
        .agg(F.least(F.count(F.lit(1)), F.lit(DP_CLAMP)).alias("c"))
    )
    released = clamped.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("true_count")
    )
    b = float(DP_CLAMP) / DP_EPSILON
    u = (
        F.conv(F.substring(F.md5(F.col("event_type")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    t = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(t)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(t))
    )
    return released.select(
        "event_type",
        "true_count",
        F.round(F.col("true_count") + noise, 3).alias("dp_count"),
        F.round(noise, 3).alias("noise"),
        F.lit(float(DP_EPSILON)).alias("epsilon"),
        F.lit(DP_CLAMP).cast("long").alias("clamp"),
    )


_Q145_SQL = f"""
WITH clamped AS (
  SELECT user_id, event_type, least(count(*), {DP_CLAMP}) AS c
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY user_id, event_type
),
released AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS true_count FROM clamped
  GROUP BY event_type
),
noised AS (
  SELECT event_type, true_count,
         CAST(('0x' || substr(md5(event_type), 1, 15)) AS BIGINT)::DOUBLE
           / 1152921504606846976.0 - 0.5 AS t
  FROM released
)
SELECT event_type, true_count,
       round(true_count
             + (-{float(DP_CLAMP) / DP_EPSILON}) * sign(t)
               * ln(1.0 - 2.0 * abs(t)), 3) AS dp_count,
       round((-{float(DP_CLAMP) / DP_EPSILON}) * sign(t)
             * ln(1.0 - 2.0 * abs(t)), 3) AS noise,
       CAST({float(DP_EPSILON)} AS DOUBLE) AS epsilon,
       CAST({DP_CLAMP} AS BIGINT) AS clamp
FROM noised
"""


PRIVACY_QUERIES = {
    "q133_kanonymity": q133_kanonymity,
    "q145_dp_release": q145_dp_release,
}
PRIVACY_ORACLES = {
    "q133_kanonymity": _Q133_SQL,
    "q145_dp_release": _Q145_SQL,
}
