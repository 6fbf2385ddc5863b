"""Contract smoke test: every ``queries()`` entry must survive analysis
against the driver's own parquet testdata.

Round 4 shipped with two ERR queries because no test loaded the driver's
``events.parquet`` through the analytics path — the regenerated file's
``timestamp[us]`` (no tz) column loads as TIMESTAMP_NTZ on Spark ≥3.5 and
``unix_micros()`` rejects it at analysis time.  This test forces analysis
of every contract query at sf0.001 so schema/dtype drift in the testdata
breaks the suite locally instead of the round artifact.
"""

import os

import pytest

import __spark_entry__ as entrymod
from postfix_log_parser_spark.analytics import TABLES, load

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

_needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata not present at {SF_DIR}"
)

QUERY_NAMES = sorted(entrymod.queries().keys())


@_needs_data
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_analyzes(spark, name):
    """Building the query and touching .schema forces full analysis
    (resolution + type checking) against the real testdata schemas."""
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    assert len(df.schema.fields) > 0


@_needs_data
def test_events_ts_loads_as_timestamp(spark):
    """The loader must normalize every on-disk encoding of events.ts
    (bigint nanos, TIMESTAMP_NTZ, plain timestamp) to TIMESTAMP."""
    conf_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prior = spark.conf.get(conf_key, "false")
    try:
        # simulate the driver harness, which does not disable NTZ inference
        spark.conf.set(conf_key, "true")
        df = load(spark, SF_DIR, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set(conf_key, prior)


@_needs_data
@pytest.mark.parametrize("table", TABLES)
def test_tables_load(spark, table):
    df = load(spark, SF_DIR, table)
    assert len(df.schema.fields) > 0
