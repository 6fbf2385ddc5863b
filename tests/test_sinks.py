"""Sink tests: parquet round-trip (S2/S3), Q5 fault routing, ClickHouse
foreachBatch shape (with a fake client)."""

import pytest

from postfix_log_parser_spark import parse_lines, sessionize
from postfix_log_parser_spark.schema import EVENT_COLUMNS
from postfix_log_parser_spark.sinks import (
    clickhouse_batch_writer,
    read_events,
    route_sink_faults,
    write_events,
)
from postfix_log_parser_spark.sources.text import lines_df
from tests.test_quirks import _line


@pytest.fixture(scope="module")
def mixed_events(spark):
    # one sinkable event, one Q5 event (no status pair -> NULL codes)
    text = f"""
{_line(0, 1, 'AAAAAAAAAAA: from=<a@b.c>, message-id=<m@1>')}
{_line(0, 2, 'AAAAAAAAAAA: to=<x@y.z>, status=sent (250 2.0.0 ok fine)')}
{_line(0, 3, 'AAAAAAAAAAA: removed')}
{_line(0, 4, 'BBBBBBBBBBB: from=<d@e.f>, message-id=<m@2>')}
{_line(0, 5, 'BBBBBBBBBBB: to=<g@h.i>, status=deferred conversation timed out')}
{_line(0, 6, 'BBBBBBBBBBB: removed')}
"""
    parsed = parse_lines(lines_df(spark, [l for l in text.splitlines() if l.strip()]))
    events, _faults, _state = sessionize(parsed)
    return events


def test_route_sink_faults_q5(mixed_events):
    ok, faults = route_sink_faults(mixed_events)
    ok_rows = ok.collect()
    fault_rows = faults.collect()
    assert [r["queue_id"] for r in ok_rows] == ["AAAAAAAAAAA"]
    assert [r["queue_id"] for r in fault_rows] == ["BBBBBBBBBBB"]
    assert "status_code" in fault_rows[0]["fault_reason"]
    assert fault_rows[0]["line"].endswith("from=<d@e.f>, message-id=<m@1>") is False


def test_parquet_round_trip(spark, mixed_events, tmp_path):
    path = str(tmp_path / "events_table")
    sinkable, _ = route_sink_faults(mixed_events)
    write_events(sinkable, path)
    back = read_events(spark, path)
    assert back.columns == EVENT_COLUMNS
    rows = back.collect()
    assert len(rows) == 1
    assert rows[0]["queue_id"] == "AAAAAAAAAAA"
    assert rows[0]["status_code"] == 250
    # partition layout: one date directory
    import os

    assert any(d.startswith("event_date=") for d in os.listdir(path))


def test_bucketed_join_has_no_shuffle(spark, mixed_events):
    from postfix_log_parser_spark.sinks import write_events_bucketed

    write_events_bucketed(mixed_events, "ev_bucket_a", buckets=4)
    write_events_bucketed(mixed_events, "ev_bucket_b", buckets=4)
    a = spark.table("ev_bucket_a").select("queue_id", "status_code")
    b = spark.table("ev_bucket_b").select("queue_id", "message_from")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketing is what avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "queue_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 2  # distinct queue_ids join 1:1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ev_bucket_a")
        spark.sql("DROP TABLE IF EXISTS ev_bucket_b")


def test_clickhouse_batch_writer_fake_client(mixed_events):
    inserted = []

    class FakeClient:
        def insert(self, table, rows, column_names):
            inserted.append((table, rows, column_names))

    writer = clickhouse_batch_writer(client_factory=FakeClient)
    sinkable, _ = route_sink_faults(mixed_events)
    writer(sinkable, batch_id=0)
    assert len(inserted) == 1
    table, rows, cols = inserted[0]
    assert table == "events"
    assert cols == EVENT_COLUMNS
    assert len(rows) == 1 and len(rows[0]) == len(EVENT_COLUMNS)
