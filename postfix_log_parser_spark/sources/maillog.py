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
* one ``InputPartition`` per file by default: parallelism = #files,
  which matches how log rotation shards real mail logs (many bounded
  files).  For a single giant UNROTATED file, ``option("splitBytes",
  N)`` switches to byte-range partitions with the next-newline
  handshake (what Hadoop's TextInputFormat does) — parallelism =
  ⌈size/N⌉ per file, seq = (file_idx << 40) | line-start byte offset,
  still totally ordered by (file, position);
* the reader streams line-by-line (no whole-file materialization) and
  yields plain tuples — Spark batches them to Arrow internally.

Since r7 batch 3 the source is also WRITABLE: ``MailLogWriter``
implements the Python Data Source write path (one ``part-<idx>.log``
text file per task, zero-padded so the reader's name-sort replays
partition order; per-file line order is the iterator order, so a
``maillog`` write→read round-trips the global (file, line) order
exactly).  The write path is a REAL two-phase commit: tasks stage to
dot-prefixed temp names (which the reader skips, so a half-written job
is invisible) and ``commit()`` on the driver renames the winners —
tasks never touch final names, so a retried or speculative task cannot
clobber committed data, and losing attempts' staged files are swept in
``commit()``/``abort()``.  ``mode("overwrite")`` clears the previous
snapshot's part files and manifest inside ``commit()`` (atomically
with the rename pass, not at write start, so a failed overwrite leaves
the previous snapshot intact); ``mode("append")`` into a directory
that already holds part files raises rather than silently interleaving
two jobs' rotation orders (stale-tail clobber: a second append with
fewer partitions would otherwise leave the old job's higher-numbered
files for the reader to replay).

Since r8 the source is also STREAM-READABLE: ``MailLogStreamReader``
(``spark.readStream.format("maillog").load(dir)``) consumes a rotated
directory one file per micro-batch with a consumed-file-list offset —
exactly-once via deterministic offset-range replay (q161).  Since r9
it is the PARTITION-BASED ``DataSourceStreamReader``: the driver only
plans offsets (``latestOffset``/``partitions``); each file's bytes are
read inside an executor task (``read(partition)``), so streaming
ingest parallelism and memory scale with executors — multi-GB rotation
files never materialize on the driver (the r8
``SimpleDataSourceStreamReader`` shape did exactly that, one whole
file as a Python list per micro-batch).  The sessionize streaming
pipeline itself stays on ``readStream.text`` + ``prepare_stream`` (its
watermark wants Spark's native file-stream bookkeeping), so the
maillog stream is the connector surface, not the fold's ingest path.

Since r9 (this session) the source is also STREAM-WRITABLE:
``MailLogStreamWriter`` (``df.writeStream.format("maillog")``)
completes the connector matrix — an exactly-once rotated-log relay
sink whose per-batch two-phase commit and ``_committed_batches``
manifest make batch replays idempotent (q166 composes stream read →
stream write → batch read → sessionize, byte-identical to q40).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
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


class _ByteRangePartition(InputPartition):
    """One byte range of one file (``splitBytes`` mode): owns every line
    whose START offset falls in [start, end)."""

    def __init__(self, index: int, path: str, start: int, end: int):
        self.index = index
        self.path = path
        self.start = start
        self.end = end


class MailLogReader(DataSourceReader):
    """Batch reader.  Default: one partition per file, ``seq = (file_idx
    << 40) | line_number`` (dense per file).  With
    ``option("splitBytes", N)`` each file additionally splits into
    ⌈size/N⌉ BYTE-RANGE partitions with the Hadoop next-newline
    handshake (a split owns exactly the lines that START inside it, so
    no line is lost or duplicated across boundaries), and ``seq``
    becomes ``(file_idx << 40) | line_start_byte_offset`` — still
    totally ordered by (file order, in-file position), just sparser;
    the downstream fold orders by seq and never assumes density, so
    both encodings satisfy the same contract.  This is the scale path
    for a single giant unrotated file: without it parallelism = #files
    and one 100 GB file would serialize through one task."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("maillog source requires a path (load(dir_or_file))")
        if os.path.isdir(path):
            names = sorted(
                n for n in os.listdir(path)
                if os.path.isfile(os.path.join(path, n))
                and not n.startswith(("_", "."))  # manifests, hidden files
            )
            self._files = [os.path.join(path, n) for n in names]
        else:
            self._files = [path]
        raw = options.get("splitbytes") or options.get("splitBytes")
        self.split_bytes = int(raw) if raw else 0  # 0 = per-file partitions
        if raw and self.split_bytes <= 0:
            raise ValueError("maillog: splitBytes must be a positive byte count")

    def partitions(self) -> list[InputPartition]:
        if not self.split_bytes:
            return [_FilePartition(i, p) for i, p in enumerate(self._files)]
        parts: list[InputPartition] = []
        for i, p in enumerate(self._files):
            size = os.path.getsize(p)
            if size >= _MAX_LINES:  # byte offsets share the 40-bit seq field
                raise ValueError(
                    f"maillog: {p} is {size} bytes; splitBytes seq encoding "
                    f"supports files under {_MAX_LINES} bytes"
                )
            for start in range(0, max(size, 1), self.split_bytes):
                parts.append(
                    _ByteRangePartition(
                        i, p, start, min(start + self.split_bytes, size)
                    )
                )
        return parts

    def read(self, partition):
        if isinstance(partition, _ByteRangePartition):
            yield from self._read_range(partition)
            return
        base = partition.index << _SEQ_BITS
        with open(partition.path, "r", errors="replace") as fh:
            for i, line in enumerate(fh):
                if i >= _MAX_LINES:
                    raise ValueError(
                        f"maillog: {partition.path} exceeds {_MAX_LINES} lines; "
                        "seq encoding would collide with the next file"
                    )
                yield (partition.path, base + i, line.rstrip("\n"))

    @staticmethod
    def _read_range(p: _ByteRangePartition):
        """Next-newline handshake: a line starting exactly at ``start``
        is ours (byte start-1 is the previous line's newline — the
        1-byte back-seek consumes just that); a line straddling
        ``start`` belongs to the previous split, which reads past its
        own ``end`` to finish it."""
        base = p.index << _SEQ_BITS
        with open(p.path, "rb") as fh:
            if p.start > 0:
                fh.seek(p.start - 1)
                fh.readline()  # finish the previous split's line
            pos = fh.tell()
            while pos < p.end:
                line = fh.readline()
                if not line:
                    break
                yield (
                    p.path,
                    base + pos,
                    line.rstrip(b"\n").decode("utf-8", errors="replace"),
                )
                pos = fh.tell()


class _StreamFilePartition(InputPartition):
    """One not-yet-consumed rotated file; index = position in the END
    offset's consumed list (drives the sparse seq base)."""

    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


class MailLogStreamReader(DataSourceStreamReader):
    """Streaming twin of ``MailLogReader`` for ROTATED logs — the
    partition-based ``DataSourceStreamReader``: offsets are planned on
    the driver but every file's BYTES are read inside an executor task
    (``read(partition)`` ships as one ``InputPartition`` per new file,
    mirroring the batch reader), so ingest parallelism and memory scale
    with executors, not the driver.  By default a micro-batch ingests
    EVERY not-yet-consumed file (name order — rotation order; one
    InputPartition each, full scan parallelism — and the semantics
    ``availableNow`` triggers require, since they capture latestOffset
    once).  ``option("maxFilesPerBatch", "1")`` caps the claim per
    micro-batch so multi-file directories exercise genuine cross-batch
    offset progression (q161/q162), like q150's maxFilesPerTrigger=1.

    Offset contract (exactly-once): the offset is the ordered list of
    consumed file names.  ``latestOffset`` claims the new files
    (name-sorted listing minus already-claimed, capped by
    maxFilesPerBatch); ``partitions(start,
    end)`` plans one partition per name in ``end`` beyond ``start`` —
    rotated files are immutable, so replaying the same offset range
    after a failure reads identical rows (the contract every
    file-based streaming source relies on).  Rows carry the same
    ``(file, seq, value)`` schema and ``(file_index << 40) | line``
    sparse seq as the batch reader.

    seq-order caveat (vs the batch reader): the file index is the
    OFFSET-LIST POSITION — consumption order — not the global
    name-sort position.  The two agree whenever files arrive in
    name-sorted order (normal log rotation); a late-arriving file whose
    name sorts before an already-consumed one gets a HIGHER seq base
    here, where a batch re-read of the same directory would sort it
    earlier.  Consumption order is the only order a stream can honor
    (the earlier files are already emitted), and it is stable across
    restarts because replay uses the checkpointed offset list verbatim.

    Restart reconciliation: after a restart Spark replans from its
    CHECKPOINTED offsets while this (fresh) reader's claim list starts
    empty; ``partitions``/``commit`` adopt any longer checkpointed list
    as the authoritative claim prefix, so a post-restart
    ``latestOffset`` can momentarily trail the checkpoint (yielding one
    empty batch: end-minus-start of a stale end is empty — no row is
    ever re-emitted) and then resumes claiming strictly new files."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("maillog stream requires a directory path")
        if not os.path.isdir(path):
            raise ValueError("maillog stream reads a ROTATED-LOG directory")
        self.path = path
        # DataSource options arrive case-insensitively lowercased
        raw = options.get("maxfilesperbatch") or options.get(
            "maxFilesPerBatch"
        )
        self.max_files = int(raw) if raw else 0  # 0 = all new files
        self._claimed: list[str] = []  # names, in consumption order

    def initialOffset(self) -> dict:
        return {"consumed": []}

    def _listing(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.path)
            if os.path.isfile(os.path.join(self.path, n))
            and not n.startswith(("_", "."))
        )

    def _adopt(self, offset: dict) -> None:
        # a checkpointed list longer than ours is authoritative (restart)
        names = list(offset.get("consumed", []))
        if len(names) > len(self._claimed):
            self._claimed = names

    def latestOffset(self) -> dict:
        claimed = set(self._claimed)
        new = [n for n in self._listing() if n not in claimed]
        if self.max_files:
            new = new[: self.max_files]
        self._claimed = self._claimed + new
        return {"consumed": list(self._claimed)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        self._adopt(start)
        self._adopt(end)
        done = set(start.get("consumed", []))
        return [
            _StreamFilePartition(index, os.path.join(self.path, name))
            for index, name in enumerate(end.get("consumed", []))
            if name not in done
        ]

    def read(self, partition: _StreamFilePartition):
        # Runs INSIDE an executor task (unlike SimpleDataSourceStreamReader,
        # whose read(start) materializes rows on the driver).  The assert is
        # the runtime guarantee of that: TaskContext exists only in tasks.
        from pyspark import TaskContext

        assert TaskContext.get() is not None, (
            "maillog stream read() must run in an executor task"
        )
        base = partition.index << _SEQ_BITS
        with open(partition.path, "r", errors="replace") as fh:
            for i, line in enumerate(fh):
                if i >= _MAX_LINES:
                    raise ValueError(
                        f"maillog: {partition.path} exceeds {_MAX_LINES} "
                        "lines; seq encoding would collide with the next file"
                    )
                yield (partition.path, base + i, line.rstrip("\n"))

    def commit(self, end: dict) -> None:
        self._adopt(end)  # rotated files are immutable; nothing to clean up

    def stop(self) -> None:
        pass


class _WroteFile(WriterCommitMessage):
    def __init__(self, staged: str, final_name: str, n_lines: int):
        self.staged = staged
        self.final_name = final_name
        self.n_lines = n_lines


class MailLogWriter(DataSourceWriter):
    """Write a single-string-column DataFrame as rotated log files.

    Two-phase commit: each task stages ``.staged-part-<pid:05d>-<task
    attempt>.log`` (dot-prefixed — invisible to the reader) and reports
    (staged path, final name ``part-<pid:05d>.log``, line count);
    ``commit()`` on the driver clears the previous snapshot when
    ``overwrite``, renames exactly the winning attempts' files to their
    zero-padded final names (the reader sorts file names, so partition
    order survives the round trip), sweeps losing attempts' leftovers,
    and writes the ``_SUCCESS`` manifest last.  Tasks never write final
    names, so task retry/speculation cannot clobber committed data.
    ``append`` into a directory that already holds part files raises —
    interleaving two jobs' rotation orders (or leaving a previous job's
    higher-numbered tail files) would corrupt the reader's seq
    contract."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("maillog writer requires a path (save(dir))")
        self.overwrite = overwrite
        # per-job tag: the writer instance is built once on the driver and
        # pickled to every task, so this uuid identifies exactly this job's
        # staged files — commit()/abort() sweep ONLY this tag, never a
        # concurrently staging job's in-flight files
        import uuid

        self.job_tag = uuid.uuid4().hex

    def _staged_prefix(self) -> str:
        return f".staged-{self.job_tag}-"

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path,
            f"{self._staged_prefix()}part-{pid:05d}-{ctx.taskAttemptId()}.log",
        )
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(f"{row[-1]}\n")
                n += 1
        return _WroteFile(staged, f"part-{pid:05d}.log", n)

    def _existing_parts(self) -> list:
        if not os.path.isdir(self.path):
            return []
        return [
            n for n in os.listdir(self.path)
            if n.startswith("part-") and n.endswith(".log")
        ]

    def commit(self, messages):
        stale = self._existing_parts()
        if stale:
            if not self.overwrite:
                # sweep this job's staged files HERE: whether Spark calls
                # abort() after a commit-phase failure is its business, the
                # directory must not depend on it
                for n in os.listdir(self.path):
                    if n.startswith(self._staged_prefix()):
                        os.remove(os.path.join(self.path, n))
                raise ValueError(
                    f"maillog: destination {self.path} already holds "
                    f"{len(stale)} part file(s); append would interleave "
                    "two jobs' rotation orders — use mode('overwrite') "
                    "or a fresh directory"
                )
            for n in stale:
                os.remove(os.path.join(self.path, n))
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                os.remove(success)
        total = 0
        for m in messages:
            if m is None:
                continue
            os.replace(m.staged, os.path.join(self.path, m.final_name))
            total += m.n_lines
        # losing speculative attempts of THIS job staged files too — sweep
        # exactly this job's tag (a concurrent job's in-flight staged files
        # carry a different uuid and are left alone)
        for n in os.listdir(self.path):
            if n.startswith(self._staged_prefix()):
                os.remove(os.path.join(self.path, n))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(f"{total}\n")

    def abort(self, messages):
        if not os.path.isdir(self.path):
            return
        for n in os.listdir(self.path):
            if n.startswith(self._staged_prefix()):
                os.remove(os.path.join(self.path, n))


class MailLogStreamWriter(DataSourceStreamWriter):
    """Streaming twin of ``MailLogWriter`` — the fourth quadrant of the
    connector matrix (batch read, batch write, stream read, STREAM
    write): an exactly-once rotated-log relay sink for
    ``df.writeStream.format("maillog")``.

    Per micro-batch, tasks stage dot-prefixed temp files on executors
    (invisible to the reader) and ``commit(messages, batchId)`` on the
    driver renames winners to ``part-<batchId:05d>-<pid:05d>.log`` —
    name-sort order is (batch order, partition order), so a downstream
    batch ``maillog`` read replays the stream's global row order
    exactly (the log-shipping contract: relay a rotated directory and
    the copy is byte- and order-identical).

    Exactly-once across restarts: committed batch ids are recorded in a
    ``_committed_batches`` manifest (underscore-prefixed — the reader
    skips it).  When Spark REPLAYS a batch after a failure (same
    batchId, re-run tasks), commit finds the id already in the manifest,
    discards the replay's staged files, and leaves the original finals
    untouched — no duplicate rotation files.  A half-committed batch
    (crash after some renames, before the manifest append) is healed on
    replay: its finals are removed and rewritten before the manifest
    records the id, so readers only ever observe manifest-recorded
    batches plus at most one in-flight batch's files, and every
    recorded batch's files are complete.

    Scale notes: staging and line IO are per-task on executors; the
    driver's commit does O(#partitions) renames and one manifest append
    per batch — the same O(file-count) metadata work every file-based
    streaming sink's commit protocol (e.g. a manifest-tracked object
    store sink) performs.  Only ``append`` output semantics exist —
    rotated logs are append-only; ``complete``/truncate is refused."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("maillog stream writer requires a path")
        if overwrite:
            raise ValueError(
                "maillog stream sink is append-only (rotated logs); "
                "complete/truncate output modes are not supported"
            )
        import uuid

        # built once on the driver, pickled to every task: identifies
        # exactly this query's staged files (see MailLogWriter.job_tag)
        self.job_tag = uuid.uuid4().hex

    def _staged_prefix(self) -> str:
        return f".staged-{self.job_tag}-"

    def _manifest(self) -> str:
        return os.path.join(self.path, "_committed_batches")

    def _committed_ids(self) -> set:
        try:
            with open(self._manifest()) as fh:
                return {int(ln) for ln in fh if ln.strip()}
        except FileNotFoundError:
            return set()

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path,
            f"{self._staged_prefix()}part-{pid:05d}-{ctx.taskAttemptId()}.log",
        )
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(f"{row[-1]}\n")
                n += 1
        return _WroteFile(staged, f"part-{pid:05d}.log", n)

    def _sweep_staged(self) -> None:
        if not os.path.isdir(self.path):
            return
        for n in os.listdir(self.path):
            if n.startswith(self._staged_prefix()):
                os.remove(os.path.join(self.path, n))

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        if batchId in self._committed_ids():
            # replay of an already-committed batch: the original finals
            # are authoritative — drop the replay's staged files
            self._sweep_staged()
            return
        # heal a half-committed previous attempt of THIS batch id
        # (crashed after renaming some finals, before the manifest append)
        prefix = f"part-{batchId:05d}-"
        for n in os.listdir(self.path):
            if n.startswith(prefix) and n.endswith(".log"):
                os.remove(os.path.join(self.path, n))
        for m in messages:
            if m is None:
                continue
            final = f"part-{batchId:05d}-{m.final_name.removeprefix('part-')}"
            os.replace(m.staged, os.path.join(self.path, final))
        self._sweep_staged()  # losing speculative attempts' leftovers
        # manifest append LAST: a batch is committed iff its id is here
        with open(self._manifest(), "a") as fh:
            fh.write(f"{batchId}\n")
            fh.flush()
            os.fsync(fh.fileno())

    def abort(self, messages, batchId: int) -> None:
        self._sweep_staged()


class MailLogDataSource(DataSource):
    """``spark.dataSource.register(MailLogDataSource)`` then
    ``spark.read.format("maillog").load(dir)`` /
    ``df.write.format("maillog").mode("append").save(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "maillog"

    def schema(self) -> StructType:
        return MAILLOG_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return MailLogReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return MailLogWriter(self.options, overwrite)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return MailLogStreamReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return MailLogStreamWriter(self.options, overwrite)


_REGISTERED = set()


def register_maillog(spark) -> None:
    """Idempotent per-session registration."""
    key = id(spark.sparkContext)
    if key not in _REGISTERED:
        spark.dataSource.register(MailLogDataSource)
        _REGISTERED.add(key)
