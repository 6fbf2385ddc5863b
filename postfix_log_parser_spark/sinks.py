"""Event sinks (S2/S3) + the sink-side fault projection (Q5).

The reference persists events to a ClickHouse ``events`` table created
with ``ENGINE MergeTree ORDER BY timestamp`` and inserts one row per
event over HTTP (``lognormalizer/parse.py:15-56`` DDL, ``:447-505``
insert).  Spark equivalents:

* ``write_events`` — bulk parquet writer, partitioned by event date and
  sorted by timestamp within partitions: the MergeTree clustering key
  becomes (partition pruning on date) + (row-group locality on time),
  and the per-row HTTP insert becomes a bulk columnar write — the
  reference's main perf defect, not ported (SURVEY §4.2).
* ``route_sink_faults`` — Q5 parity: the reference's sink reads
  ``event.status_code`` unconditionally, so an event whose description
  had no ``(ddd, d.d.d)`` pair raises AttributeError → fault channel
  (``parse.py:466-467``).  The engine emits such events with NULL codes;
  this projection splits them off exactly where the reference faults.
* ``clickhouse_batch_writer`` — optional real ClickHouse sink as a
  ``foreachBatch`` callback inserting executor-side via
  ``foreachPartition`` (no driver collect), import-gated (the driver
  container has no clickhouse-connect; the code path is exercised with a
  fake client in tests).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.statetable import (
    StateTable,
    dynamic_partition_overwrite,
)
from postfix_log_parser_spark.schema import EVENT_COLUMNS


def _events_table(spark: SparkSession, path: str) -> StateTable:
    """The date-partitioned events table as a StateTable (schema
    inferred — the events table always carries data when maintained):
    the takedown/refresh lifecycle shares the partition-scoped
    overwrite + drained-partition sweep with the streamcc/streamann/
    streambm25 state stores, and the layout manifest pins the partition
    grain."""
    return StateTable(
        spark, path, schema=None, partition_col="event_date",
        n_buckets=None, key_desc="to_date(timestamp)",
    )


def route_sink_faults(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split events the reference's sink would fault on (Q5: NULL
    status_code → AttributeError at ``parse.py:466-467``).

    Returns ``(sinkable, faults)`` — faults in the standard fault-channel
    shape (line, fault_reason, queue_id); ``line`` carries the first
    raw_log line for operator forensics.
    """
    bad = F.col("status_code").isNull()
    sinkable = events.filter(~bad)
    faults = events.filter(bad).select(
        F.get(F.col("raw_log"), 0).alias("line"),
        F.lit(
            "AttributeError: 'PostfixEvent' object has no attribute 'status_code'"
        ).alias("fault_reason"),
        F.col("queue_id"),
    )
    return sinkable, faults


def write_events(events: DataFrame, path: str, mode: str = "append") -> None:
    """S2+S3: bulk columnar write, date-partitioned, time-sorted.

    At 100 TB: date partitions give partition pruning for time-range
    queries (the dominant access pattern implied by ``ORDER BY
    timestamp``); ``sortWithinPartitions`` gives parquet min/max row-group
    pruning within a day.  ``repartition(event_date)`` keeps one writer
    task per date partition to avoid small files; for heavily skewed
    single-day loads, add a bucketing column to fan out.
    """
    (
        events.withColumn("event_date", F.to_date("timestamp"))
        .repartition(F.col("event_date"))
        .sortWithinPartitions("timestamp")
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def overwrite_event_days(events: DataFrame, path: str) -> None:
    """Idempotent day-level reprocessing: DYNAMIC partition overwrite
    replaces only the ``event_date`` partitions present in ``events``,
    leaving every other day untouched.  The operational story for a
    date-partitioned 100 TB events table: re-ingest one corrected day
    (late logs, a parser fix) without rewriting the table or disturbing
    readers of other partitions.  Static overwrite mode would instead
    truncate the whole table — the conf is scoped and restored."""
    with dynamic_partition_overwrite(events.sparkSession):
        write_events(events, path, mode="overwrite")


def compact_event_days(
    spark: SparkSession,
    path: str,
    days: list[str] | None = None,
    target_file_mb: int = 512,
) -> None:
    """Small-files compaction for the date-partitioned events table.

    Streaming ingestion (one writer per micro-batch) accretes many small
    parquet files per day; small files are the classic large-table decay
    mode (per-file open cost dominates scans, listing slows planning).
    This rewrites the selected days — default: every day currently in the
    table — coalescing each to ~``target_file_mb`` files and re-sorting
    by timestamp (restoring row-group min/max pruning), then swaps them
    in atomically per-partition via dynamic partition overwrite.  Days
    not selected are never touched, so compaction can run incrementally
    behind ingestion."""
    df = spark.read.parquet(path)
    if days is not None:
        df = df.filter(F.col("event_date").isin([str(d) for d in days]))
    # MEASURED sizing from the scan's own file metadata (one row per
    # input file per day via the per-file min; file size is constant per
    # file): per-day rows + on-disk bytes, so raw_log-heavy days no
    # longer overshoot the way the old 256 B/row constant did
    stats = (
        df.select(
            "event_date",
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.file_size").alias("_fs"),
        )
        .groupBy("event_date", "_fp")
        .agg(F.min("_fs").alias("_fs"), F.count(F.lit(1)).alias("_n"))
        .groupBy("event_date")
        .agg(F.sum("_fs").alias("day_bytes"), F.sum("_n").alias("day_rows"))
        .collect()
    )
    if not stats:
        return
    target_bytes = target_file_mb * 1024 * 1024
    bytes_per_row = max(
        1.0,
        sum(int(r["day_bytes"]) for r in stats)
        / max(1, sum(int(r["day_rows"]) for r in stats)),
    )
    # hard per-file cap: the parquet writer splits any task's output at
    # this row count, so file sizes track the target even when the slot
    # hash below lands two slots in one shuffle partition
    rows_per_file = max(1, int(target_bytes / bytes_per_row))
    n_files = {
        str(r["event_date"]): max(1, -(-int(r["day_rows"]) // rows_per_file))
        for r in stats
    }
    files_expr = F.coalesce(
        *[
            F.when(F.col("event_date") == d, F.lit(k))
            for d, k in n_files.items()
        ]
    ) if n_files else F.lit(1)
    # repartition on (event_date, file slot): write PARALLELISM scales
    # with the day size (one task per ~target_file_mb of input); the
    # partition-local sort restores the time order
    slot = F.pmod(F.xxhash64(F.col("timestamp"), F.col("queue_id")), files_expr)
    compacted = (
        df.withColumn("_slot", slot)
        .repartition(F.col("event_date"), F.col("_slot"))
        .drop("_slot")
        .sortWithinPartitions("timestamp")
        .select(*EVENT_COLUMNS, "event_date")
    )
    with dynamic_partition_overwrite(spark):
        (
            compacted.write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy("event_date")
            .parquet(path)
        )


def delete_events(spark: SparkSession, path: str, predicate) -> list:
    """GDPR-style takedown for the date-partitioned events table:
    remove every event matching ``predicate`` (a boolean Column — a
    queue_id, a recipient domain, a sender) with PARTITION-SCOPED I/O,
    mirroring the dedup family's takedown lifecycle (q174/q175/q177).

    1. Affected days: one column-pruned scan of the predicate columns +
       the partition column (predicate pushdown applies; parquet
       min/max row-group stats prune further for time-correlated
       predicates).  This is the unavoidable find-the-rows pass — at
       100 TB it reads only the predicate columns' bytes.
    2. Rewrite: ONLY the affected day partitions are re-read, filtered
       to survivors, and swapped in via dynamic partition overwrite
       (the survivors frame is eagerly checkpointed first — its rows
       are computed FROM the directories being overwritten).  Days the
       predicate never touched are never read again nor rewritten.
    3. A day whose events were ALL deleted receives no overwrite —
       its stale directory is swept explicitly.

    NULL semantics match SQL DELETE: only rows where the predicate is
    TRUE are removed — a row where it evaluates to NULL survives (the
    keep filter is ``NOT coalesce(predicate, false)``, not ``NOT
    predicate``, which would silently drop NULL rows in affected days
    while identical rows in untouched days survived).

    Returns the list of affected day strings (audit trail).
    Idempotent: re-applying finds no matching rows and does nothing."""
    df = spark.read.parquet(path)
    affected = sorted(
        str(r.event_date)
        for r in df.filter(predicate).select("event_date").distinct().collect()
    )
    if not affected:
        return []
    kept = (
        df.filter(F.col("event_date").isin(affected))
        .filter(~F.coalesce(predicate, F.lit(False)))
        .select(*EVENT_COLUMNS, "event_date")
        .repartition(F.col("event_date"))
        .sortWithinPartitions("timestamp")
        .localCheckpoint(eager=True)
    )
    # partition-scoped overwrite + fully-drained-day sweep, shared with
    # the streaming state stores (ext/statetable.py)
    _events_table(spark, path).overwrite_partitions(affected, kept)
    return affected


_ROLLUP_SCHEMA = (
    "n_events bigint, sum_status bigint, first_time string, event_date date"
)


def _rollup_frame(events: DataFrame) -> DataFrame:
    """The daily rollup grain (q44's projection as a maintained MV):
    per-day event count, status-code sum, first event time."""
    return events.groupBy(F.to_date("timestamp").alias("event_date")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("status_code").cast("long").alias("sum_status"),
        F.min(F.date_format("timestamp", "HH:mm:ss.SSSSSS")).alias("first_time"),
    )


def write_event_rollup(spark: SparkSession, events_path: str, mv_path: str) -> None:
    """Materialize the daily rollup, partitioned by day so refreshes can
    be partition-scoped (the batch build; q57 owns the streaming form)."""
    events = spark.read.parquet(events_path)
    (
        _rollup_frame(events)
        .select("n_events", "sum_status", "first_time", "event_date")
        .write.mode("overwrite").partitionBy("event_date").parquet(mv_path)
    )


def refresh_event_rollup(
    spark: SparkSession, events_path: str, mv_path: str, days: list
) -> None:
    """Propagate a base-table change (a ``delete_events`` takedown, a
    day re-ingest) into the derived rollup WITHOUT rebuilding it: only
    the changed days' partitions are recomputed from the events table
    (partition-pruned scan) and swapped in via dynamic partition
    overwrite; a day whose source rows all disappeared is swept from
    the MV.  This is the right-to-erasure completeness step — deleting
    base rows must not leave their aggregates behind — and the
    partition-scoped twin of a full MV rebuild, proven equal to one by
    q179's oracle."""
    if not days:
        return
    days = [str(d) for d in days]
    events = spark.read.parquet(events_path)
    fresh = (
        _rollup_frame(events.filter(F.col("event_date").isin(days)))
        .select("n_events", "sum_status", "first_time", "event_date")
        .localCheckpoint(eager=True)
    )
    # a day whose last source row was deleted is swept from the MV by
    # the shared drained-partition sweep
    StateTable(
        spark, mv_path, schema=None, partition_col="event_date",
        n_buckets=None, key_desc="to_date(timestamp) rollup grain",
    ).overwrite_partitions(days, fresh)


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table back with the canonical column order."""
    return spark.read.parquet(path).select(*EVENT_COLUMNS)


def write_events_bucketed(
    events: DataFrame,
    table: str,
    buckets: int = 32,
    bucket_col: str = "queue_id",
) -> None:
    """S2/S3 variant for join-heavy workloads: a bucketed, sorted managed
    table.  Two tables bucketed the same way (same column, same bucket
    count) join with NO exchange on either side — at 100 TB that turns
    the dominant shuffle of event↔event or event↔dim-enriched joins into
    a local zip of pre-sorted buckets.  Complements ``write_events``
    (date-partitioned path tables for time-range pruning)."""
    (
        events.write.mode("overwrite")
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def _default_client_factory() -> "object":
    try:
        import clickhouse_connect  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - optional dep
        raise ImportError(
            "clickhouse-connect is not installed; pass client_factory= "
            "or install it to use the ClickHouse sink"
        ) from exc
    return clickhouse_connect.get_client()


def clickhouse_batch_writer(
    client_factory: Callable[[], "object"] | None = None,
    table: str = "events",
    rows_per_insert: int = 100_000,
) -> Callable[[DataFrame, int], None]:
    """Optional ClickHouse sink: a ``foreachBatch`` callback that inserts
    EXECUTOR-SIDE via ``foreachPartition`` — one client per partition
    task, one bulk insert per ``rows_per_insert`` chunk (replacing the
    reference's per-event HTTP round-trip, ``parse.py:453-505``).

    Nothing is ever collected to the driver: each partition's rows are
    serialized straight from the executor to ClickHouse, so driver memory
    is O(1) in the batch size and the insert fan-out scales with the
    number of partitions — the shape a 1000-executor cluster needs.
    ``rows_per_insert`` bounds executor memory for a skewed partition.

    ``client_factory`` must be picklable (it is shipped inside the task
    closure and invoked once per partition on the executor); by default it
    tries ``clickhouse_connect`` and raises ImportError with a clear
    message if absent (the library is optional).
    """
    factory = client_factory if client_factory is not None else _default_client_factory
    cols = list(EVENT_COLUMNS)

    def write_partition(rows_iter) -> None:
        client = None
        chunk: list[list] = []
        for row in rows_iter:
            if client is None:
                client = factory()
            chunk.append([row[c] for c in cols])
            if len(chunk) >= rows_per_insert:
                client.insert(table, chunk, column_names=cols)
                chunk = []
        if chunk:
            client.insert(table, chunk, column_names=cols)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.foreachPartition(write_partition)

    return write_batch
