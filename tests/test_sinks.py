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


def _file_fake_factory(outdir: str):
    """Factory for a fake ClickHouse client that records each insert as a
    JSON file — inserts happen in executor worker processes, so a shared
    directory (not a driver-side list) is the only way to observe them.
    Everything is defined inside the closure so cloudpickle ships it by
    value (the tests module is not importable on the workers)."""

    def factory():
        class FileFakeClient:
            def insert(self, table, rows, column_names):
                import json
                import os
                import uuid

                payload = {
                    "table": table,
                    "n_rows": len(rows),
                    "row_widths": sorted({len(r) for r in rows}),
                    "cols": list(column_names),
                }
                path = os.path.join(outdir, f"{uuid.uuid4().hex}.json")
                with open(path, "w", encoding="utf-8") as f:
                    json.dump(payload, f)

        return FileFakeClient()

    return factory


def test_clickhouse_batch_writer_fake_client(mixed_events, tmp_path):
    import json
    import os

    outdir = str(tmp_path / "inserts")
    os.makedirs(outdir)
    writer = clickhouse_batch_writer(client_factory=_file_fake_factory(outdir))
    sinkable, _ = route_sink_faults(mixed_events)
    writer(sinkable, batch_id=0)
    inserts = [
        json.load(open(os.path.join(outdir, f), encoding="utf-8"))
        for f in os.listdir(outdir)
    ]
    assert len(inserts) >= 1  # one insert per non-empty partition
    assert all(i["table"] == "events" for i in inserts)
    assert all(i["cols"] == EVENT_COLUMNS for i in inserts)
    assert all(i["row_widths"] == [len(EVENT_COLUMNS)] for i in inserts)
    assert sum(i["n_rows"] for i in inserts) == 1


def test_clickhouse_writer_never_collects_on_driver(mixed_events, tmp_path, monkeypatch):
    """The scale contract: the sink path must not materialize the batch on
    the driver.  Poison every driver-side materialization entry point and
    run the writer — any collect()/toPandas()/toLocalIterator() raises."""
    import os

    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):  # pragma: no cover - should never run
        raise AssertionError("driver-side collect in ClickHouse sink path")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    monkeypatch.setattr(DataFrame, "toLocalIterator", _boom)
    outdir = str(tmp_path / "inserts")
    os.makedirs(outdir)
    writer = clickhouse_batch_writer(client_factory=_file_fake_factory(outdir))
    sinkable, _ = route_sink_faults(mixed_events)
    writer(sinkable, batch_id=0)
    assert len(os.listdir(outdir)) >= 1


def test_clickhouse_writer_chunks_large_partitions(spark, tmp_path):
    """rows_per_insert bounds executor memory: a partition larger than the
    chunk size becomes several bulk inserts."""
    import json
    import os

    outdir = str(tmp_path / "inserts")
    os.makedirs(outdir)
    # 25 rows in ONE partition with a 10-row chunk limit -> 3 inserts
    df = spark.range(25).coalesce(1).selectExpr("id AS queue_id")
    writer = clickhouse_batch_writer(
        client_factory=_file_fake_factory(outdir), rows_per_insert=10
    )
    # the writer projects EVENT_COLUMNS; build a batch with those columns
    from postfix_log_parser_spark.schema import EVENT_COLUMNS as COLS
    from pyspark.sql import functions as F

    batch = df.select(
        *[F.col("queue_id").cast("string").alias(c) for c in COLS]
    ).coalesce(1)
    writer(batch, batch_id=0)
    inserts = [
        json.load(open(os.path.join(outdir, f), encoding="utf-8"))
        for f in os.listdir(outdir)
    ]
    assert sorted(i["n_rows"] for i in inserts) == [5, 10, 10]


def test_overwrite_event_days_is_partition_scoped(spark, tmp_path):
    """Dynamic partition overwrite replaces only the days being
    reprocessed; every other date partition survives byte-for-byte."""
    import pyspark.sql.functions as F

    from postfix_log_parser_spark.logquery import ALL_EVENTS_FIXTURE, _run
    from postfix_log_parser_spark.sinks import overwrite_event_days

    events, _faults, _state = _run(spark, ALL_EVENTS_FIXTURE)
    sinkable, _ = route_sink_faults(events)
    path = str(tmp_path / "events_table")
    write_events(sinkable, path)

    def by_day():
        return {
            str(r["event_date"]): r["n"]
            for r in spark.read.parquet(path)
            .groupBy("event_date")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    before = by_day()
    target = min(before)  # 2024-04-09 (3 events in the fixture)
    assert before[target] > 1
    one_row = sinkable.filter(F.to_date("timestamp") == F.lit(target)).limit(1)
    overwrite_event_days(one_row, path)

    after = by_day()
    assert after[target] == 1  # the reprocessed day was replaced
    for day, n in before.items():
        if day != target:
            assert after[day] == n  # untouched partitions survive
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_compact_event_days(spark, tmp_path):
    """Many small per-day files compact to ~one file per day with data
    and time-sort preserved; a day excluded from compaction keeps its
    original file layout."""
    import glob

    import pyspark.sql.functions as F

    from postfix_log_parser_spark.logquery import ALL_EVENTS_FIXTURE, _run
    from postfix_log_parser_spark.sinks import compact_event_days

    events, _faults, _state = _run(spark, ALL_EVENTS_FIXTURE)
    sinkable, _ = route_sink_faults(events)
    path = str(tmp_path / "events_table")
    # scatter: one file per row (streaming-ingestion decay mode)
    (
        sinkable.repartition(8)
        .withColumn("event_date", F.to_date("timestamp"))
        .write.partitionBy("event_date")
        .parquet(path)
    )
    rows_before = sorted(
        r["queue_id"] for r in spark.read.parquet(path).collect()
    )
    days = sorted(
        d.rsplit("=", 1)[1] for d in glob.glob(path + "/event_date=*")
    )
    skip_day, compact_days = days[0], days[1:]
    files_of = lambda d: glob.glob(f"{path}/event_date={d}/*.parquet")  # noqa: E731
    skip_before = sorted(files_of(skip_day))
    n_small = sum(len(files_of(d)) for d in compact_days)

    compact_event_days(spark, path, days=compact_days)

    assert sorted(files_of(skip_day)) == skip_before  # untouched day intact
    assert sum(len(files_of(d)) for d in compact_days) == len(compact_days)
    assert n_small > len(compact_days)  # compaction actually merged files
    rows_after = sorted(
        r["queue_id"] for r in spark.read.parquet(path).collect()
    )
    assert rows_after == rows_before


import os as _os

import pytest as _pytest


@_pytest.mark.skipif(
    not _os.environ.get("CLICKHOUSE_URL"),
    reason="live ClickHouse smoke: set CLICKHOUSE_URL (dsn) to enable; this "
    "sandbox has no server, so the executor-side insert path is covered by "
    "the fake-client tests above (same untested-live status as the "
    "reference's own sink)",
)
def test_clickhouse_live_roundtrip(spark):
    """Insert → count round-trip of ``clickhouse_batch_writer`` against a
    REAL server (env-gated).  Uses the all-string 22-column batch from the
    chunking test against a matching String DDL; the factory ships the dsn
    by value (executors don't see the driver env)."""
    import uuid

    import clickhouse_connect

    from postfix_log_parser_spark.schema import EVENT_COLUMNS as COLS
    from pyspark.sql import functions as F

    dsn = _os.environ["CLICKHOUSE_URL"]
    table = f"events_smoke_{uuid.uuid4().hex[:8]}"
    admin = clickhouse_connect.get_client(dsn=dsn)
    cols_ddl = ", ".join(f"`{c}` String" for c in COLS)
    admin.command(
        f"CREATE TABLE {table} ({cols_ddl}) ENGINE = MergeTree ORDER BY queue_id"
    )
    try:

        def factory(dsn=dsn):
            import clickhouse_connect as cc

            return cc.get_client(dsn=dsn)

        batch = spark.range(25).select(
            *[F.col("id").cast("string").alias(c) for c in COLS]
        )
        writer = clickhouse_batch_writer(
            client_factory=factory, table=table, rows_per_insert=10
        )
        writer(batch, batch_id=0)
        assert int(admin.command(f"SELECT count() FROM {table}")) == 25
    finally:
        admin.command(f"DROP TABLE IF EXISTS {table}")


def test_compact_sizes_from_measured_bytes(spark, tmp_path):
    """A raw_log-heavy day compacts to files near target_file_mb because
    sizing comes from the day's MEASURED on-disk bytes (scan _metadata),
    not a per-row constant — the r5-flagged overshoot mode."""
    import glob
    import os

    import pyspark.sql.functions as F

    from postfix_log_parser_spark.sinks import compact_event_days

    # ~3000 events with ~2.5 KB of hard-to-compress raw_log each
    fat = F.array(
        *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{i}")))
            for i in range(80)
        ]
    )
    arr1 = F.array(F.md5(F.col("id").cast("string")))
    events = spark.range(3000).select(
        F.timestamp_seconds(F.lit(1712685762) + F.col("id")).alias("timestamp"),
        F.lpad(F.upper(F.hex(F.col("id"))), 11, "0").alias("queue_id"),
        F.lit("d.com").alias("domain_from"),
        arr1.alias("domains_to"),
        F.lit("<a@d.com>").alias("message_from"),
        arr1.alias("message_to"),
        F.md5(F.col("id").cast("string")).alias("message_id"),
        F.lit(None).cast("string").alias("message_subject"),
        F.lit("sent").alias("status"),
        F.lit(250).alias("status_code"),
        F.lit("2.0.0").alias("status_postfix_code"),
        F.lit("ok").alias("status_description"),
        F.lit(None).cast("string").alias("client"),
        F.lit(None).cast("string").alias("orig_to"),
        F.lit(None).cast("string").alias("dovecot_fileinto_action"),
        F.lit(None).cast("string").alias("delay"),
        F.lit(None).cast("string").alias("delays"),
        F.lit(None).cast("string").alias("dsn"),
        F.lit(None).cast("string").alias("nrcpt"),
        F.lit(None).cast("string").alias("relay"),
        F.lit(None).cast("string").alias("size"),
        fat.alias("raw_log"),
    )
    path = str(tmp_path / "events_fat")
    (
        events.repartition(16)
        .withColumn("event_date", F.to_date("timestamp"))
        .write.partitionBy("event_date")
        .parquet(path)
    )
    day_files = glob.glob(path + "/event_date=*/*.parquet")
    day_bytes = sum(os.path.getsize(f) for f in day_files)
    assert day_bytes > 2 * 1024 * 1024  # the fixture is genuinely fat

    compact_event_days(spark, path, target_file_mb=1)

    out_files = glob.glob(path + "/event_date=*/*.parquet")
    sizes_mb = sorted(os.path.getsize(f) / 2**20 for f in out_files)
    # enough files that none can be a 10x-overshoot monolith...
    expected = max(1, -(-day_bytes // (1024 * 1024)))
    assert len(out_files) >= expected - 1, (len(out_files), expected)
    # ...and the typical file lands within ±50% of the target (remainder
    # files after the maxRecordsPerFile split may be smaller; none larger)
    median_mb = sizes_mb[len(sizes_mb) // 2]
    assert 0.5 <= median_mb <= 1.5, sizes_mb
    assert sizes_mb[-1] <= 1.6, sizes_mb


def test_rollup_incremental_merge_and_replay(spark, tmp_path):
    """The MV writer merges per-batch deltas into only the touched day
    partitions, leaves untouched partitions byte-stable, and is
    idempotent on batch replay (the foreachBatch retry case)."""
    import pyspark.sql.functions as F

    from postfix_log_parser_spark.logquery import rollup_upsert_writer

    mv = str(tmp_path / "mv")
    writer = rollup_upsert_writer(spark, mv)
    sch = "ts timestamp, event_type string, value double"

    def batch(rows):
        return spark.createDataFrame(rows, sch)

    import datetime as dt

    h1 = dt.datetime(2024, 1, 1, 10, 15)
    h2 = dt.datetime(2024, 1, 1, 12, 5)
    h3 = dt.datetime(2024, 1, 2, 9, 0)  # different day partition

    writer(batch([(h1, "A", 1.0), (h1, "A", 2.0), (h2, "B", 3.0)]), 0)

    def snapshot():
        return {
            (str(r["hour_ts"]), r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.read.parquet(mv).collect()
        }

    s0 = snapshot()
    assert s0[("2024-01-01 10:00:00", "A")] == (2, 3.0)
    assert s0[("2024-01-01 12:00:00", "B")] == (1, 3.0)

    # batch 1: extends hour H1 (same day -> merge) and opens a new day
    writer(batch([(h1, "A", 4.0), (h3, "C", 5.0)]), 1)
    s1 = snapshot()
    assert s1[("2024-01-01 10:00:00", "A")] == (3, 7.0)  # delta merged
    assert s1[("2024-01-01 12:00:00", "B")] == (1, 3.0)  # untouched hour kept
    assert s1[("2024-01-02 09:00:00", "C")] == (1, 5.0)  # new day partition

    # replayed batch id: skipped entirely (exactly-once on retry)
    writer(batch([(h1, "A", 4.0), (h3, "C", 5.0)]), 1)
    assert snapshot() == s1

    # an empty batch is a no-op
    writer(batch([]), 2)
    assert snapshot() == s1


def test_delete_events_is_partition_scoped(spark, tmp_path):
    """GDPR delete on the date-partitioned events table (q178's core):
    only the predicate's days are touched — a fully-drained day is
    swept, a partially-hit day is rewritten without the matches, and
    every other day's files are byte-identical afterwards.  Re-applying
    the same delete is a no-op."""
    import os

    from pyspark.sql import functions as F

    from postfix_log_parser_spark.logquery import ALL_EVENTS_FIXTURE, _run
    from postfix_log_parser_spark.sinks import delete_events

    events, _faults, _state = _run(spark, ALL_EVENTS_FIXTURE)
    sinkable, _ = route_sink_faults(events)
    path = str(tmp_path / "events")
    write_events(sinkable, path)

    def snapshot(day):
        d = f"{path}/event_date={day}"
        return {f: os.stat(f"{d}/{f}").st_mtime_ns for f in os.listdir(d)}

    untouched = {d: snapshot(d) for d in ("2024-04-09", "2024-04-30")}

    affected = delete_events(spark, path, F.col("domain_from") == "gmail.com")
    assert affected == ["2024-05-10", "2024-05-11"]
    # 2024-05-10 held only the gmail event — fully drained and swept
    assert not os.path.exists(f"{path}/event_date=2024-05-10")
    # 2024-05-11 keeps its non-gmail event
    back = read_events(spark, path)
    assert {r.queue_id for r in back.select("queue_id").collect()} == {
        "85C6C10208A", "2D7291020EE", "74F8A1019D1", "DBC88100165"
    }
    # the partition-scoped pin: days the predicate never matched were
    # neither rewritten nor touched
    for day, snap in untouched.items():
        assert snapshot(day) == snap, f"untouched day {day} was rewritten"
    # idempotent: nothing left to delete
    assert delete_events(spark, path, F.col("domain_from") == "gmail.com") == []


def test_refresh_event_rollup_is_partition_scoped(spark, tmp_path):
    """q179's core: propagating a base-table delete into the daily
    rollup MV recomputes ONLY the affected days — a fully-drained day
    leaves the MV, untouched days' MV files stay byte-identical, and
    the refreshed MV equals a from-scratch rebuild."""
    import os

    from pyspark.sql import functions as F

    from postfix_log_parser_spark.logquery import ALL_EVENTS_FIXTURE, _run
    from postfix_log_parser_spark.sinks import (
        delete_events,
        refresh_event_rollup,
        write_event_rollup,
    )

    events, _faults, _state = _run(spark, ALL_EVENTS_FIXTURE)
    sinkable, _ = route_sink_faults(events)
    path = str(tmp_path / "events")
    mv = str(tmp_path / "rollup")
    write_events(sinkable, path)
    write_event_rollup(spark, path, mv)

    def snapshot(day):
        d = f"{mv}/event_date={day}"
        return {f: os.stat(f"{d}/{f}").st_mtime_ns for f in os.listdir(d)}

    untouched = {d: snapshot(d) for d in ("2024-04-09", "2024-04-30")}

    affected = delete_events(spark, path, F.col("domain_from") == "gmail.com")
    refresh_event_rollup(spark, path, mv, affected)
    # the drained day's aggregate left the MV with its base rows
    assert not os.path.exists(f"{mv}/event_date=2024-05-10")
    # untouched days were not recomputed
    for day, snap in untouched.items():
        assert snapshot(day) == snap, f"untouched MV day {day} was rewritten"
    # partition-scoped refresh == full rebuild
    rebuilt = str(tmp_path / "rebuilt")
    write_event_rollup(spark, path, rebuilt)
    got = {tuple(r) for r in spark.read.parquet(mv)
           .select("event_date", "n_events", "sum_status", "first_time").collect()}
    want = {tuple(r) for r in spark.read.parquet(rebuilt)
            .select("event_date", "n_events", "sum_status", "first_time").collect()}
    assert got == want and got
    # no-op refresh: empty day list touches nothing
    refresh_event_rollup(spark, path, mv, [])
    for day, snap in untouched.items():
        assert snapshot(day) == snap


def test_delete_events_null_predicate_rows_survive(spark, mixed_events, tmp_path):
    """SQL DELETE semantics: a row where the predicate evaluates to NULL
    is NOT deleted — even when it lives in an affected day that gets
    rewritten (the r11 ADVICE latent bug: ``~predicate`` alone silently
    dropped NULL rows in rewritten days while identical rows in
    untouched days survived)."""
    from pyspark.sql import functions as F

    from postfix_log_parser_spark.sinks import delete_events

    sinkable, _ = route_sink_faults(mixed_events)
    base = sinkable.limit(1)
    rows = (
        base.withColumn("domain_from", F.lit("gmail.com"))
        .withColumn("queue_id", F.lit("GMAILQUEUE1"))
        .unionByName(
            base.withColumn("domain_from", F.lit(None).cast("string"))
            .withColumn("queue_id", F.lit("NULLQUEUE02"))
        )
    )
    path = str(tmp_path / "events")
    write_events(rows, path)
    affected = delete_events(spark, path, F.col("domain_from") == "gmail.com")
    assert len(affected) == 1  # both rows share the fixture's single day
    back = read_events(spark, path)
    assert {r.queue_id for r in back.collect()} == {"NULLQUEUE02"}
