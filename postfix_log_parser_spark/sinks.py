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
  ``foreachBatch`` bulk insert, import-gated (the driver container has
  no clickhouse-connect; the code path is exercised with a fake client
  in tests).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.schema import EVENT_COLUMNS


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


def event_rows(batch: DataFrame) -> list[list]:
    """Project a micro-batch to the reference's positional insert shape
    (``parse.py:455-480``: 22 columns, arrays as lists)."""
    return [[row[c] for c in EVENT_COLUMNS] for row in batch.collect()]


def clickhouse_batch_writer(
    client_factory: Callable[[], "object"] | None = None,
    table: str = "events",
) -> Callable[[DataFrame, int], None]:
    """Optional ClickHouse sink: a ``foreachBatch`` callback doing ONE
    bulk insert per micro-batch (replacing the reference's per-event HTTP
    round-trip, ``parse.py:453-505``).

    ``client_factory`` builds the client on the driver per batch; by
    default tries ``clickhouse_connect`` and raises ImportError with a
    clear message if absent (the library is optional).
    """
    def make_client() -> "object":
        if client_factory is not None:
            return client_factory()
        try:
            import clickhouse_connect  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - optional dep
            raise ImportError(
                "clickhouse-connect is not installed; pass client_factory= "
                "or install it to use the ClickHouse sink"
            ) from exc
        return clickhouse_connect.get_client()

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        rows = event_rows(batch)
        if rows:
            make_client().insert(table, rows, column_names=EVENT_COLUMNS)

    return write_batch
