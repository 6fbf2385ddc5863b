"""Training-corpus export operators — deterministic sharding and
range-partitioned sorted layout.

The last stage of a pretraining-data pipeline is the export: the
deduplicated, filtered corpus has to land on disk (a) split into a fixed
number of shards a training job can map 1:1 to data-loader workers, with
a placement that is DETERMINISTIC (re-running the export yields
byte-identical shard membership, so checkpoint resume sees the same
data), and (b) optionally range-ordered (e.g. by length for sequence
bucketing) with disjoint per-file ranges so readers can prune.

The reference stops at a ClickHouse sink (``lognormalizer/parse.py:447-505``);
these operators are the corresponding batch-corpus sinks, Spark-first:

* q80 — hash-sharded export: ``shard = md5(doc_id) % N``, a pure column
  expression (portable, engine-independent — NOT Spark's ``hash()``,
  whose seed is an implementation detail), one hash repartition aligned
  to the write so each task writes exactly one shard directory, then a
  schema-checked read-back through partition discovery and a per-shard
  verifying aggregate.  At 100 TB this is one shuffle; the
  ``partitionBy`` layout gives readers per-shard partition pruning.
* q81 — range-partitioned sorted layout: ``repartitionByRange`` (range
  exchange with sampled boundaries — the one shuffle) +
  ``sortWithinPartitions`` (no global sort barrier; each partition sorts
  locally).  The query is SELF-VERIFYING in the q15 style: it returns
  the corpus row count plus three invariant booleans (partition count
  bounded, per-partition key ranges pairwise disjoint, rows
  non-decreasing within every partition) that the oracle asserts as
  literal TRUE — sampled range boundaries are engine-internal and are
  never hashed.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.analytics import load

N_SHARDS = 8
N_RANGES = 8

_WORK_ROOT: list[str] = []


def _work_dir(prefix: str) -> str:
    if not _WORK_ROOT:
        root = tempfile.mkdtemp(prefix="plps_export_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _WORK_ROOT.append(root)
    return tempfile.mkdtemp(prefix=prefix, dir=_WORK_ROOT[0])


def _shard_col(key: F.Column) -> F.Column:
    """Portable md5-derived shard id, shared bit-for-bit with DuckDB."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % N_SHARDS
    )


def q80_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sharded corpus export → read-back stats.

    Output: one row per shard (shard, n_docs, sum_chars, min_doc,
    max_doc); the oracle recomputes shard membership from the source
    table, so the round trip proves placement determinism end-to-end.
    """
    docs = load(spark, sf_dir, "documents")
    sharded = docs.withColumn("shard", _shard_col(F.col("doc_id")))
    path = _work_dir("q80_shards_") + "/corpus"
    # one hash exchange on the shard key: every write task owns whole
    # shards, so partitionBy emits one file per (task, shard) = 1 file
    # per shard here, N files per shard at scale with maxRecordsPerFile
    (
        sharded.repartition(N_SHARDS, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # schema-EXPLICIT read-back: no discovery/inference pass (at 100 TB
    # that is a full extra listing), and an empty export stays readable
    back = spark.read.schema(sharded.schema).parquet(path)
    return back.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


_Q80_SQL = f"""
SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         % {N_SHARDS} AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM documents
GROUP BY 1
"""


def q81_range_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned, locally sorted corpus layout, self-verified.

    ``repartitionByRange(n_chars, doc_id)`` + ``sortWithinPartitions``
    is the scalable total-order layout: one sampled range exchange, no
    single-partition global sort.  Returns (total_docs, parts_bounded,
    ranges_disjoint, sorted_within) — the booleans are the layout
    invariants; the oracle asserts them as literal TRUE.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranged = (
        docs.repartitionByRange(N_RANGES, F.col("n_chars"), F.col("doc_id"))
        .sortWithinPartitions("n_chars", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        # mid is assigned sequentially per partition in row order, so it
        # witnesses the physical in-partition ordering for the check
        .withColumn("mid", F.monotonically_increasing_id())
    )
    in_order = (
        F.col("prev_chars").isNull()
        | (F.col("prev_chars") < F.col("n_chars"))
        | (
            (F.col("prev_chars") == F.col("n_chars"))
            & (F.col("prev_doc") <= F.col("doc_id"))
        )
    )
    wp = Window.partitionBy("pid").orderBy("mid")
    per_row = ranged.select(
        "pid",
        "n_chars",
        "doc_id",
        F.lag("n_chars").over(wp).alias("prev_chars"),
        F.lag("doc_id").over(wp).alias("prev_doc"),
    ).select("pid", "n_chars", "doc_id", in_order.alias("row_ok"))
    parts = per_row.groupBy("pid").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("n_chars", "doc_id")).alias("lo"),
        F.max(F.struct("n_chars", "doc_id")).alias("hi"),
        F.min("row_ok").alias("part_sorted"),
    )
    wo = Window.orderBy("pid")  # ≤ N_RANGES rows: driver-scale window
    checked = parts.select(
        "cnt",
        "part_sorted",
        (
            F.lag("hi").over(wo).isNull()
            | (F.lag("hi").over(wo) < F.col("lo"))
        ).alias("part_disjoint"),
    )
    return checked.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("total_docs"),
        (F.count(F.lit(1)) <= N_RANGES).alias("parts_bounded"),
        F.min("part_disjoint").alias("ranges_disjoint"),
        F.min("part_sorted").alias("sorted_within"),
    )


_Q81_SQL = """
SELECT count(*) AS total_docs,
       TRUE AS parts_bounded,
       TRUE AS ranges_disjoint,
       TRUE AS sorted_within
FROM documents
"""


N_BUCKETS = 8


def q100_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: two tables bucketed + sorted on the same
    key join with NO exchange on either side.

    At 100 TB this is the layout decision that removes the dominant
    shuffle from recurring fact↔fact / fact↔big-dim joins: both tables
    are written once with ``bucketBy(N, key).sortBy(key)``, and every
    subsequent join on the key reads pre-partitioned, pre-sorted buckets
    — the SortMergeJoin's exchanges (and usually its sorts) vanish from
    the plan (plan-asserted: the only exchange left is the final
    aggregate's).  Tables are EXTERNAL (explicit path in scratch) so no
    warehouse dir is touched; the ``merge`` hint keeps Catalyst from
    broadcasting the test-scale dim, which would bypass the bucketed
    path entirely.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    dim = ev.groupBy("user_id").agg(
        F.avg("value").alias("user_avg"), F.count(F.lit(1)).alias("n_user")
    )
    work = _work_dir("q100_bkt_")
    for name, df, sub in (
        ("plps_ev_bkt", ev, "ev"),
        ("plps_dim_bkt", dim, "dim"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, "user_id")
            .sortBy("user_id")
            .option("path", f"{work}/{sub}")
            .format("parquet")
            .saveAsTable(name)
        )
    e = spark.table("plps_ev_bkt")
    d = spark.table("plps_dim_bkt").hint("merge")
    return (
        e.join(d, "user_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") - F.col("user_avg")), 2).alias(
                "sum_dev"
            ),
        )
    )


_Q100_SQL = """
WITH dim AS (
  SELECT user_id, avg(value) AS user_avg FROM events GROUP BY 1
)
SELECT e.event_type, count(*) AS n_events,
       round(sum(e.value - d.user_avg), 2) AS sum_dev
FROM events e JOIN dim d USING (user_id)
GROUP BY e.event_type
"""


# ---------------------------------------------------------------------------
# q126 — export QA via the Observation API (metrics without a second scan)
# ---------------------------------------------------------------------------
#
# Every production export needs an audit row (how many rows, how many
# chars, key range) — and the naive way is to re-aggregate the corpus
# after writing, i.e. scan 100 TB twice.  Spark's ``Observation``
# (``df.observe``) attaches the aggregates to the WRITE job itself: the
# metrics are folded in per task and merged on the driver — O(1) driver
# state, zero extra scan, exact (unlike accumulators, observed metrics
# are consistent under task retries).
#
# The query performs a real parquet export with observed metrics, then
# ALSO recomputes the counts the expensive way from the read-back files
# — the self-verification: ``readback_match`` must be literal TRUE, and
# the observed numbers are hashed against the oracle's direct aggregate.

def q126_observed_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text", "source")
    )
    obs = Observation("export_qa")
    out_dir = _work_dir("q126_obs_")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
    observed.write.mode("overwrite").parquet(f"{out_dir}/corpus")
    m = obs.get  # blocks until the write action's metrics are merged
    back = spark.read.parquet(f"{out_dir}/corpus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("s"),
    ).collect()[0]
    as_long = lambda v: None if v is None else int(v)  # noqa: E731
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                # empty corpus: sum/min/max observe as NULL — keep them
                # NULL (the oracle's empty-input aggregates match)
                as_long(m["sum_chars"]),
                as_long(m["min_id"]),
                as_long(m["max_id"]),
                bool(back["n"] == m["n_rows"] and back["s"] == m["sum_chars"]),
            )
        ],
        "n_rows long, sum_chars long, min_id long, max_id long, readback_match boolean",
    )


_Q126_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       TRUE AS readback_match
FROM documents WHERE text IS NOT NULL
"""


EXPORT_QUERIES = {
    "q126_observed_export": q126_observed_export,
    "q80_shard_export": q80_shard_export,
    "q81_range_export": q81_range_export,
    "q100_bucketed_join": q100_bucketed_join,
}

EXPORT_ORACLES = {
    "q126_observed_export": _Q126_SQL,
    "q80_shard_export": _Q80_SQL,
    "q81_range_export": _Q81_SQL,
    "q100_bucketed_join": _Q100_SQL,
}
