"""Table profiling (q64) — the ANALYZE-style per-column statistics pass
a curation pipeline runs before ingesting a new source: row count, null
count, exact distinct count, and a min/max representative per column.

Scale shape: ONE single-column aggregation per profiled column, unioned
— each scan is column-pruned to exactly that column (plan-asserted), so
the cost is Σ(column bytes), the same I/O a single multi-distinct pass
would need, WITHOUT the Expand blow-up Catalyst plans for multiple
``count(DISTINCT ...)`` in one aggregate (an Expand multiplies the scan
by the number of distinct aggregates — the q15 lesson).  At 100 TB the
per-column passes run as independent stages (and a real deployment
would flip exact distinct to ``approx_count_distinct`` — the
self-verifying q15 pattern — once columns stop fitting a hash agg; the
plumbing here is identical).

``text``'s min/max representative is its LENGTH (documented): hashing
multi-KB extreme strings into the profile helps nobody.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROFILE_COLUMNS = ("doc_id", "lang", "source", "n_chars", "text")


def _profile_one(docs: DataFrame, col: str) -> DataFrame:
    c = F.col(col)
    repr_col = F.length(c) if col == "text" else c
    return docs.select(col).agg(
        F.lit(col).alias("col_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(c.isNull(), 1)).alias("n_nulls"),
        F.count_distinct(c).alias("n_distinct"),
        F.min(repr_col).cast("string").alias("min_repr"),
        F.max(repr_col).cast("string").alias("max_repr"),
    )


def q64_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = [_profile_one(docs, c) for c in PROFILE_COLUMNS]
    return reduce(DataFrame.unionByName, parts)


def _one_sql(col: str) -> str:
    repr_expr = f"length({col})" if col == "text" else col
    return f"""
SELECT '{col}' AS col_name,
       count(*) AS n_rows,
       count(CASE WHEN {col} IS NULL THEN 1 END) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       CAST(min({repr_expr}) AS VARCHAR) AS min_repr,
       CAST(max({repr_expr}) AS VARCHAR) AS max_repr
FROM documents"""


_Q64_SQL = "\nUNION ALL\n".join(_one_sql(c) for c in PROFILE_COLUMNS)

PROFILE_QUERIES = {"q64_table_profile": q64_table_profile}
PROFILE_ORACLES = {"q64_table_profile": _Q64_SQL}
