"""Oracle result-type gate: no HUGEINT/int128 column may ever reach the
driver's typed hasher.

Round 6's only red CORRECTNESS row (q101) was value-identical but
hash-mismatched: DuckDB ``sum(INTEGER)`` yields HUGEINT (int128) while
Spark's ``sum(int)`` yields bigint, and the driver hashes TYPED cells.
Four more oracles carried the same latent drift (q74/q80/q83/q85).  This
gate plans every ``oracle_sql()`` entry on DuckDB (planning only — no
execution, so the whole surface checks in seconds) and fails on any
int128-family output column, pointing at the one-line
``CAST(... AS BIGINT)`` fix.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from postfix_log_parser_spark.analytics import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

_needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata not present at {SF_DIR}"
)

_FORBIDDEN = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


ORACLES = sorted(entrymod.oracle_sql().items())


@_needs_data
@pytest.mark.parametrize("name,sql", ORACLES, ids=[n for n, _ in ORACLES])
def test_oracle_has_no_int128_columns(con, name, sql):
    rel = con.sql(sql)  # lazy: plans the query, does not run it
    bad = {
        col: str(t)
        for col, t in zip(rel.columns, rel.types)
        if str(t).upper() in _FORBIDDEN
    }
    assert not bad, (
        f"{name}: oracle column(s) {bad} are int128-family — the driver "
        "hashes typed cells, so this WILL hash-mismatch against Spark's "
        "bigint even when values are identical. Wrap the expression in "
        "CAST(... AS BIGINT)."
    )
