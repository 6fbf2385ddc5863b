"""Entity resolution — blocked fuzzy matching between two record sets.

The canonical record-linkage shape for a large-scale data pipeline:
never all-pairs — candidates come from an equi-join on a cheap blocking
key, and only candidates pay the edit-distance compare.

The second "source" is synthesized deterministically from ``customer``
(every 10th record gets a typo'd name and an offset key), so both
engines see the same dirty data and the match set is exactly
reproducible — same technique as the dedup family's perturbed copies.

Scale notes (100 TB):

* The join is a hash-partitioned equi-join on (nationkey, name-suffix
  block key).  Block size bounds the quadratic compare: with B records
  per block the compare cost is O(B²) per block, never O(N²) overall.
  Skewed blocks would be salted exactly like q19 demonstrates.
* ``levenshtein`` is a JVM builtin (whole-stage codegen) — no Python in
  the hot path.
* At real scale the dirty side is its own table; the derivation here is
  a narrow map standing in for that scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.analytics import load

MAX_LEV = 2


def q76_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match clean customers against a typo'd twin set.

    Blocking: same nation + same last-3-chars of the name (survives the
    synthesized typos, which only touch the name head).  Match: candidate
    pairs with levenshtein ≤ 2.  Output one row per matched pair.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    dirty = cust.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 500000).alias("d_custkey"),
        # 'Customer#…' → 'Custmer-…': one deletion + one substitution
        F.regexp_replace(
            F.regexp_replace("c_name", "^Customer", "Custmer"), "#", "-"
        ).alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
    )
    cand = cust.withColumn("blk_l", F.substring("c_name", -3, 3)).join(
        dirty.withColumn("blk_r", F.substring("d_name", -3, 3)),
        on=(F.col("c_nationkey") == F.col("d_nationkey"))
        & (F.col("blk_l") == F.col("blk_r")),
    )
    lev = F.levenshtein("c_name", "d_name")
    return cand.filter(lev <= MAX_LEV).select(
        "c_custkey",
        "d_custkey",
        "c_name",
        "d_name",
        lev.alias("lev"),
    )


_Q76_SQL = f"""
WITH dirty AS (
  SELECT c_custkey + 500000 AS d_custkey,
         replace(regexp_replace(c_name, '^Customer', 'Custmer'), '#', '-') AS d_name,
         c_nationkey AS d_nationkey
  FROM customer WHERE c_custkey % 10 = 0
),
cand AS (
  SELECT c.c_custkey, d.d_custkey, c.c_name, d.d_name
  FROM customer c JOIN dirty d
    ON c.c_nationkey = d.d_nationkey
   AND substr(c.c_name, length(c.c_name) - 2, 3)
       = substr(d.d_name, length(d.d_name) - 2, 3)
)
SELECT c_custkey, d_custkey, c_name, d_name,
       levenshtein(c_name, d_name) AS lev
FROM cand WHERE levenshtein(c_name, d_name) <= {MAX_LEV}
"""


ENTITY_QUERIES = {
    "q76_entity_resolution": q76_entity_resolution,
}

ENTITY_ORACLES = {
    "q76_entity_resolution": _Q76_SQL,
}
