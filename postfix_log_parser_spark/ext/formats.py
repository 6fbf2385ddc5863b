"""Interchange-format sources/sinks — JSONL and CSV round-trips.

The reference ingests syslog text and emits to ClickHouse
(``lognormalizer/parse.py:406-505``); a pipeline engine also needs the
interchange formats that sit between systems.  These queries prove the
full write→read cycle for line-delimited JSON and CSV: partitioned
distributed write, schema-EXPLICIT read (never inference — at 100 TB a
schema-inference pass is a full extra scan of the corpus), and a
verifying aggregate whose oracle reads the original parquet.

Scale notes:

* Writes inherit the input partitioning (one file per partition, no
  repartition) — format conversion is a narrow map.
* Reads use an explicit DDL schema, so the JSON/CSV scans are
  single-pass and the text parsing stays JVM-side (Jackson/Univocity),
  no Python.
* Timestamps cross the text boundary as formatted strings
  (``yyyy-MM-dd HH:mm:ss.SSSSSS``, UTC session) — the engine's standard
  deterministic timestamp contract, immune to JSON timestamp-precision
  drift.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.analytics import load

_WORK_ROOT: list[str] = []


def _work_dir(prefix: str) -> str:
    if not _WORK_ROOT:
        root = tempfile.mkdtemp(prefix="plps_fmt_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _WORK_ROOT.append(root)
    return tempfile.mkdtemp(prefix=prefix, dir=_WORK_ROOT[0])


_TEXT_SCHEMA = (
    "event_id long, ts_s string, user_id long, "
    "event_type string, value double, props string"
)


def _textable_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )


def _roundtrip_agg(back: DataFrame) -> DataFrame:
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("ts_s").alias("first_ts"),
        F.count_distinct("user_id").alias("n_users"),
    )


def q78_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → line-delimited JSON files → schema-explicit read →
    verifying aggregate (oracle aggregates the original parquet)."""
    path = _work_dir("q78_jsonl_") + "/events_jsonl"
    _textable_events(spark, sf_dir).write.mode("overwrite").json(path)
    back = spark.read.schema(_TEXT_SCHEMA).json(path)
    return _roundtrip_agg(back)


def q79_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → CSV (quoted: ``props`` carries JSON with commas/quotes)
    → schema-explicit read → verifying aggregate."""
    path = _work_dir("q79_csv_") + "/events_csv"
    _textable_events(spark, sf_dir).write.mode("overwrite").option(
        "header", "true"
    ).csv(path)
    back = (
        spark.read.schema(_TEXT_SCHEMA)
        .option("header", "true")
        .csv(path)
    )
    return _roundtrip_agg(back)


_ROUNDTRIP_SQL = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(strftime(ts, '%Y-%m-%d %H:%M:%S.%f')) AS first_ts,
       count(DISTINCT user_id) AS n_users
FROM events WHERE event_id % 5 = 0
GROUP BY event_type
"""


def q99_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → ORC files → schema-explicit read → verifying aggregate.

    ORC is the third columnar interchange format Spark ships natively
    (after parquet and the text formats above); the round trip proves
    the same write→read contract — predicate pushdown and column
    pruning work on the ORC scan exactly as on parquet."""
    path = _work_dir("q99_orc_") + "/events_orc"
    _textable_events(spark, sf_dir).write.mode("overwrite").orc(path)
    back = spark.read.schema(_TEXT_SCHEMA).orc(path)
    return _roundtrip_agg(back)


def q102_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → XML (native Spark 4 source, one <event> row tag per
    record) → schema-explicit read → verifying aggregate.  XML is the
    interchange format legacy enterprise feeds still emit; the native
    source keeps parsing JVM-side like the other text formats."""
    path = _work_dir("q102_xml_") + "/events_xml"
    (
        _textable_events(spark, sf_dir)
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "event")
        .save(path)
    )
    back = (
        spark.read.schema(_TEXT_SCHEMA)
        .format("xml")
        .option("rowTag", "event")
        .load(path)
    )
    return _roundtrip_agg(back)


FORMATS_QUERIES = {
    "q78_jsonl_roundtrip": q78_jsonl_roundtrip,
    "q79_csv_roundtrip": q79_csv_roundtrip,
    "q99_orc_roundtrip": q99_orc_roundtrip,
    "q102_xml_roundtrip": q102_xml_roundtrip,
}

FORMATS_ORACLES = {
    "q78_jsonl_roundtrip": _ROUNDTRIP_SQL,
    "q79_csv_roundtrip": _ROUNDTRIP_SQL,
    "q99_orc_roundtrip": _ROUNDTRIP_SQL,
    "q102_xml_roundtrip": _ROUNDTRIP_SQL,
}
