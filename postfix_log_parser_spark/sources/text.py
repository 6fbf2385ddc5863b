"""Text log sources (S1) — batch and streaming.

The reference slurps all of stdin with ``readlines()``
(``lognormalizer/parse.py:515-516``); here the input is a partitioned
Spark text scan.  Line order is semantic (quirks Q1-Q3: last-wins folds,
first-timestamp, raw_log order), so every source attaches an explicit
``seq`` — and the ordering must hold for multi-file and multi-split
inputs, where Spark packs splits by size (descending), not scan order.

``read_text`` derives a deterministic global seq with NO shuffle of the
data and no global sort:

1. tag each row with ``(input_file_name, input_file_block_start,
   monotonically_increasing_id)`` — rows within one scan partition (one
   split) are in file order, and the mono id is monotone within it;
2. aggregate per-split metadata (row count + min mono id) — a small
   aggregate with one row per split;
3. number the splits cumulatively in ``(file, block_start)`` order — a
   window over the tiny split list, not the data;
4. broadcast-join the offsets back: ``seq = split_row_offset + (mono -
   min_mono)``.

Cost: one extra pass over the text for the metadata aggregate (cheap
narrow scan); the data itself is never shuffled or sorted.  Determinism
relies on Spark's split planning being deterministic for a fixed file
listing (it is: splits are computed from sizes and packed in sorted
order), so both scans see identical (file, block, mono) assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_text(
    spark: SparkSession,
    path: str,
    ordered: bool = True,
    max_literal_splits: int = 4096,
) -> DataFrame:
    """Batch text source: one ``value`` string column plus a global ``seq``
    consistent with (file name, in-file position) order.

    ``ordered=False`` skips the metadata pass and uses the raw
    ``monotonically_increasing_id`` — only safe when downstream ignores
    cross-line ordering (e.g. pure filtering/counting jobs).

    Two seq-attach strategies, switched on split count:

    * ``<= max_literal_splits`` — the per-split offsets are resolved
      EAGERLY (one tiny metadata job, one row per split) and embedded as
      a literal map, so downstream consumers scan the data exactly once.
      Driver cost is O(#splits) — bounded by the threshold.  A split key
      missing from the map (the input dir changed between ``read_text``
      and a later action — rotated/appended log files) raises
      ``SEQ_SPLIT_DRIFT`` at execution instead of silently producing
      NULL seq and corrupting the order-sensitive fold.  The default
      threshold (4096 splits ≈ 512 GB at 128 MB splits) keeps the
      ``CreateMap`` expression tree well under the 64KB whole-stage-
      codegen method limit — a larger literal map silently drops the
      projection to interpreted eval AND re-serializes the map into
      every task.
    * ``> max_literal_splits`` — offsets stay distributed: the same
      per-split aggregate feeds a window over the split list and
      broadcast-joins back onto the scan.  No driver materialization
      and no outsized expression tree; the metadata subplan re-executes
      per downstream action (the price of staying fully lazy at that
      scale).
    """
    df = spark.read.text(path)
    if not ordered:
        return df.withColumn("seq", F.monotonically_increasing_id())
    tagged = (
        df.withColumn("_file", F.input_file_name())
        .withColumn("_block", F.expr("input_file_block_start()"))
        .withColumn("_mono", F.monotonically_increasing_id())
    )
    # cheap split-count gate: planned scan partitions (no job).  Split
    # keys can exceed partition count when many small files pack into one
    # partition, so the post-collect length check below is the backstop.
    if df.rdd.getNumPartitions() > max_literal_splits:
        return _attach_seq_join(tagged)
    meta = (
        tagged.groupBy("_file", "_block")
        .agg(F.count(F.lit(1)).alias("n"), F.min("_mono").alias("min_mono"))
        .collect()
    )
    if len(meta) > max_literal_splits:
        return _attach_seq_join(tagged)
    meta.sort(key=lambda r: (r["_file"], r["_block"]))
    adjust: dict[str, int] = {}
    offset = 0
    for r in meta:
        adjust[f"{r['_file']}@{r['_block']}"] = offset - r["min_mono"]
        offset += r["n"]
    if not adjust:
        return df.withColumn("seq", F.lit(None).cast("long")).limit(0).select(
            "value", "seq"
        )
    return _attach_seq_literal(tagged, adjust)


def _attach_seq_literal(tagged: DataFrame, adjust: dict[str, int]) -> DataFrame:
    """Embed per-split offsets as a literal map; fail fast (not NULL-seq)
    on a split key the eager metadata pass never saw."""
    pairs: list = []
    for k, v in adjust.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    adj_map = F.create_map(*pairs)
    key = F.concat_ws("@", F.col("_file"), F.col("_block"))
    offset = F.coalesce(
        adj_map[key],
        F.raise_error(
            F.concat(
                F.lit("SEQ_SPLIT_DRIFT: unknown split "),
                key,
                F.lit(
                    " — input files changed between read_text() and this "
                    "action; re-create the DataFrame"
                ),
            )
        ).cast("long"),
    )
    return tagged.withColumn("seq", (F.col("_mono") + offset).cast("long")).select(
        "value", "seq"
    )


def _attach_seq_join(tagged: DataFrame) -> DataFrame:
    """Distributed offset attach: window the per-split aggregate (one row
    per split) into cumulative offsets, broadcast-join back on the split
    key.  The window sorts only the split list, never the data."""
    meta = tagged.groupBy("_file", "_block").agg(
        F.count(F.lit(1)).alias("_n"), F.min("_mono").alias("_min_mono")
    )
    w = Window.orderBy("_file", "_block").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = meta.select(
        "_file",
        "_block",
        (F.coalesce(F.sum("_n").over(w), F.lit(0)) - F.col("_min_mono")).alias(
            "_adj"
        ),
    )
    return (
        tagged.join(F.broadcast(offsets), ["_file", "_block"])
        .withColumn("seq", (F.col("_mono") + F.col("_adj")).cast("long"))
        .select("value", "seq")
    )


def lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Library/test source: parallelize in-memory lines with their order."""
    return spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)], "seq long, value string"
    )


def read_text_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming text source (file drop directory)."""
    return spark.readStream.text(path)
