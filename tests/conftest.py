import datetime

import pytest

from postfix_log_parser_spark import get_spark, parse_lines, sessionize
from postfix_log_parser_spark.sources.text import lines_df


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


class Harness:
    """Batch equivalent of the reference's ExtPostfixLogParser test harness
    (``lognormalizer/parse_test.py:10-23``): feed lines, inspect events,
    faults and residual state."""

    def __init__(self, spark, lines):
        self.spark = spark
        df = lines_df(spark, list(lines))
        parsed = parse_lines(df)
        events_df, faults_df, state_df = sessionize(parsed, keep_order_columns=True)
        # emission order == order of the removed line in the input
        self.events = [
            r.asDict(recursive=True)
            for r in events_df.orderBy("_removed_seq").drop(
                "_start_seq", "_removed_seq"
            ).collect()
        ]
        self.faults = [r.asDict() for r in faults_df.collect()]
        self.state = {r["queue_id"]: r.asDict(recursive=True) for r in state_df.collect()}


@pytest.fixture(scope="session")
def run_lines(spark):
    def _run(text: str) -> Harness:
        return Harness(spark, text.splitlines())

    return _run


def utc(s: str) -> datetime.datetime:
    """Parse an ISO timestamp and normalize to naive-UTC (Spark session tz
    is UTC; collected timestamps are naive UTC instants)."""
    dt = datetime.datetime.fromisoformat(s)
    return dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
