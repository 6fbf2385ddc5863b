"""Null-input tolerance: every contract query must run against tables
where a fifth of the nullable values (text, embedding, event_type,
value, props, user_id, lang, source, label) are NULL.  Real corpora
have nulls; vector/media operators DROP null payloads at the scan
(documented in their loaders — a null vector or payload is unusable in
any downstream op), relational operators follow SQL null semantics.
"""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from postfix_log_parser_spark.analytics import TABLES

_NULLABLE = {
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding", "label"],
    "events": ["event_type", "value", "props", "user_id"],
}


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        key = df.columns[0]
        for c in _NULLABLE.get(t, []):
            if c in df.columns:
                df = df.withColumn(
                    c,
                    F.when(F.col(key) % 5 == 0, F.lit(None).cast(dict(df.dtypes)[c]))
                    .otherwise(F.col(c)),
                )
        df.write.mode("overwrite").parquet(str(tmp / f"{t}.parquet"))
    return str(tmp)


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_tolerates_nulls(spark, null_sf_dir, name):
    out = entry.queries()[name](spark, null_sf_dir)
    out.count()  # must execute, not throw
    assert out.columns
