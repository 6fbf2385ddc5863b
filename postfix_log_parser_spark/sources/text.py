"""Text log sources (S1) — batch and streaming.

The reference slurps all of stdin with ``readlines()``
(``lognormalizer/parse.py:515-516``); here the input is a partitioned
Spark text scan.  Order is semantic (quirks Q1-Q3) so every source
attaches an explicit ``seq``:

* single-file / in-order scans: ``monotonically_increasing_id`` (partition
  prefixed ids are monotone with scan order);
* multi-file logs at scale: ``(input_file_name, offset-within-file)``
  ordering — files sort lexicographically like ``mail.log*`` rotations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_text(spark: SparkSession, path: str, ordered_multifile: bool = False) -> DataFrame:
    """Batch text source: one ``value`` string column plus ``seq``."""
    df = spark.read.text(path)
    if ordered_multifile:
        # deterministic global order across rotated files: file name, then
        # position within the file.  One window shuffle, only for multi-file
        # replays where cross-file order matters.
        w = Window.orderBy(F.col("_file"), F.col("_pos"))
        df = (
            df.withColumn("_file", F.input_file_name())
            .withColumn("_pos", F.monotonically_increasing_id())
            .withColumn("seq", F.row_number().over(w).cast("long"))
            .drop("_file", "_pos")
        )
    else:
        df = df.withColumn("seq", F.monotonically_increasing_id())
    return df


def lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Library/test source: parallelize in-memory lines with their order."""
    return spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)], "seq long, value string"
    )


def read_text_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming text source (file drop directory)."""
    return spark.readStream.text(path)
