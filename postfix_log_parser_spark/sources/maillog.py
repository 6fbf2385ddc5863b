"""``maillog`` — a Spark 4 Python Data Source for ordered log ingestion.

``sources.text.read_text`` reconstructs a global line order on top of the
built-in text scan with a per-split metadata pass.  Spark 4's Python Data
Source API (`pyspark.sql.datasource`) lets the source itself own that
contract instead: every emitted row carries its file and a ``seq`` that
is globally consistent with (file order, in-file position) — no second
pass, no ``input_file_block_start`` surgery, usable by anyone as
``spark.read.format("maillog").load(dir)`` after one ``register`` call.

seq encoding: ``(file_index << 40) | line_number`` with files sorted by
name at planning time.  The order is total and stable; the values are
deliberately sparse — the downstream fold (``operators.sessionize``)
orders by seq, it never assumes density.  40 bits ≈ 10^12 lines per
file before overflow; the reader raises at the bound rather than wrap.

Scale notes:

* planning lists the directory once on the driver — O(#files), the same
  cost every file-based Spark source pays in ``FileIndex``;
* one ``InputPartition`` per file: parallelism = #files, which matches
  how log rotation shards real mail logs (many bounded files).  A
  single giant unsplit file would serialize — the fix at that shape is
  byte-range partitions with next-newline handshake (what Hadoop's
  TextInputFormat does); per-file keeps the seq contract trivially
  exact and is the right trade for rotated logs;
* the reader streams line-by-line (no whole-file materialization) and
  yields plain tuples — Spark batches them to Arrow internally.

The source is intentionally read-only and batch-only; streaming ingest
stays on ``readStream.text`` + ``prepare_stream`` (the watermark needs
Spark's native file-stream bookkeeping).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SEQ_BITS = 40
_MAX_LINES = 1 << _SEQ_BITS

MAILLOG_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("seq", LongType()),
        StructField("value", StringType()),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


class MailLogReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("maillog source requires a path (load(dir_or_file))")
        if os.path.isdir(path):
            names = sorted(
                n for n in os.listdir(path)
                if os.path.isfile(os.path.join(path, n))
            )
            self._files = [os.path.join(path, n) for n in names]
        else:
            self._files = [path]

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(i, p) for i, p in enumerate(self._files)]

    def read(self, partition: _FilePartition):
        base = partition.index << _SEQ_BITS
        with open(partition.path, "r", errors="replace") as fh:
            for i, line in enumerate(fh):
                if i >= _MAX_LINES:
                    raise ValueError(
                        f"maillog: {partition.path} exceeds {_MAX_LINES} lines; "
                        "seq encoding would collide with the next file"
                    )
                yield (partition.path, base + i, line.rstrip("\n"))


class MailLogDataSource(DataSource):
    """``spark.dataSource.register(MailLogDataSource)`` then
    ``spark.read.format("maillog").load(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "maillog"

    def schema(self) -> StructType:
        return MAILLOG_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return MailLogReader(self.options)


_REGISTERED = set()


def register_maillog(spark) -> None:
    """Idempotent per-session registration."""
    key = id(spark.sparkContext)
    if key not in _REGISTERED:
        spark.dataSource.register(MailLogDataSource)
        _REGISTERED.add(key)
