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


def read_text(spark: SparkSession, path: str, ordered: bool = True) -> DataFrame:
    """Batch text source: one ``value`` string column plus a global ``seq``
    consistent with (file name, in-file position) order.

    ``ordered=False`` skips the metadata pass and uses the raw
    ``monotonically_increasing_id`` — only safe when downstream ignores
    cross-line ordering (e.g. pure filtering/counting jobs).
    """
    df = spark.read.text(path)
    if not ordered:
        return df.withColumn("seq", F.monotonically_increasing_id())
    tagged = (
        df.withColumn("_file", F.input_file_name())
        .withColumn("_block", F.expr("input_file_block_start()"))
        .withColumn("_mono", F.monotonically_increasing_id())
    )
    # resolve per-split offsets EAGERLY, once, like schema inference: a
    # tiny metadata job (one row per split) whose result is embedded as a
    # literal map — so every downstream consumer scans the data exactly
    # once, with no metadata subplan or join re-executed per branch.
    meta = (
        tagged.groupBy("_file", "_block")
        .agg(F.count(F.lit(1)).alias("n"), F.min("_mono").alias("min_mono"))
        .collect()
    )
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
    pairs: list = []
    for k, v in adjust.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    adj_map = F.create_map(*pairs)
    key = F.concat_ws("@", F.col("_file"), F.col("_block"))
    return tagged.withColumn(
        "seq", (F.col("_mono") + adj_map[key]).cast("long")
    ).select("value", "seq")


def lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Library/test source: parallelize in-memory lines with their order."""
    return spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)], "seq long, value string"
    )


def read_text_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming text source (file drop directory)."""
    return spark.readStream.text(path)
