"""SparkSession factory with scale-oriented defaults.

Tuned for the local[32] test harness but every setting is the one you'd
want on a 1000-executor cluster too: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow for the few Python stages,
UTC session time so timestamps round-trip deterministically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "postfix_log_parser_spark") -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local-mode scan parallelism: the bench logs are ~15 MB, which is
        # ONE split at the 128 MB default — keep splits small so all 32
        # cores engage.  On a real cluster leave the default (128 MB).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m"),
        )
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamp[us] without tz would otherwise load as
        # TIMESTAMP_NTZ (Spark ≥3.5), which unix_micros() rejects; under a
        # forced-UTC session the plain TIMESTAMP reading is identical.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-created session.

    The driver harness creates its own SparkSession; the parser depends on
    a couple of runtime-settable confs (map dedup policy for last-wins k=v
    folding, UTC timestamps for deterministic comparisons) that we set
    defensively on every entry point.
    """
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:  # pragma: no cover - not runtime-settable on old builds
        pass
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:  # pragma: no cover - conf may be static on some builds
        pass
    return spark
