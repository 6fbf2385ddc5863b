"""The ``maillog`` Python Data Source: ordering, partitioning, edge cases."""

import os

import pytest
from pyspark.sql import functions as F

from postfix_log_parser_spark.sources.maillog import register_maillog


@pytest.fixture()
def log_dir(tmp_path):
    (tmp_path / "b.log").write_text("b0\nb1\n")
    (tmp_path / "a.log").write_text("a0\na1\na2\n")
    (tmp_path / "c.log").write_text("")  # empty rotated file
    return str(tmp_path)


def test_global_order_is_file_name_then_line(spark, log_dir):
    register_maillog(spark)
    rows = (
        spark.read.format("maillog").load(log_dir)
        .orderBy("seq")
        .select("value")
        .collect()
    )
    assert [r.value for r in rows] == ["a0", "a1", "a2", "b0", "b1"]


def test_one_partition_per_file(spark, log_dir):
    register_maillog(spark)
    df = spark.read.format("maillog").load(log_dir)
    assert df.rdd.getNumPartitions() == 3
    files = {os.path.basename(r.file) for r in df.select("file").distinct().collect()}
    assert files == {"a.log", "b.log"}  # empty file yields no rows


def test_seq_is_sparse_but_strictly_increasing_across_files(spark, log_dir):
    register_maillog(spark)
    seqs = [r.seq for r in
            spark.read.format("maillog").load(log_dir).orderBy("seq").collect()]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert seqs[3] - seqs[2] > 1  # file boundary jump (sparse encoding)


def test_single_file_path_load(spark, tmp_path):
    register_maillog(spark)
    p = tmp_path / "solo.log"
    p.write_text("only\n")
    rows = spark.read.format("maillog").load(str(p)).collect()
    assert [(r.seq, r.value) for r in rows] == [(0, "only")]


def test_maillog_writer_roundtrip_and_manifest(spark, tmp_path):
    """Writer contract: zero-padded part files replay partition order in
    the reader's name-sort, the committed _SUCCESS manifest records the
    total line count, and the reader SKIPS the manifest."""
    from postfix_log_parser_spark.sources.maillog import register_maillog

    register_maillog(spark)
    out = str(tmp_path / "log_out")
    lines = [f"line {i:03d}" for i in range(30)]
    df = spark.createDataFrame(
        list(enumerate(lines)), "idx long, value string"
    )
    (
        df.repartitionByRange(4, "idx")
        .sortWithinPartitions("idx")
        .select("value")
        .write.format("maillog")
        .mode("append")
        .save(out)
    )
    import os

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read().strip() == "30"
    back = (
        spark.read.format("maillog").load(out)
        .orderBy("seq")
        .select("value")
        .collect()
    )
    assert [r.value for r in back] == lines
    # commit() swept all staged temp files
    assert not [n for n in names if n.startswith(".staged-")]


def _write_maillog(df, out, mode):
    (
        df.write.format("maillog").mode(mode).save(out)
    )


def test_maillog_overwrite_clears_stale_tail(spark, tmp_path):
    """Overwrite with FEWER partitions than the previous snapshot must
    not leave the old job's higher-numbered part files for the reader
    to replay, and the manifest must count only the new snapshot."""
    register_maillog(spark)
    out = str(tmp_path / "ow")
    first = spark.createDataFrame(
        [(i, f"old {i}") for i in range(8)], "idx long, value string"
    )
    _write_maillog(
        first.repartitionByRange(4, "idx").sortWithinPartitions("idx")
        .select("value"), out, "append",
    )
    assert len([n for n in os.listdir(out) if n.startswith("part-")]) == 4
    second = spark.createDataFrame(
        [(i, f"new {i}") for i in range(3)], "idx long, value string"
    )
    _write_maillog(
        second.repartitionByRange(2, "idx").sortWithinPartitions("idx")
        .select("value"), out, "overwrite",
    )
    parts = sorted(n for n in os.listdir(out) if n.startswith("part-"))
    assert len(parts) == 2  # stale part-00002/3 removed
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read().strip() == "3"
    back = [
        r.value for r in
        spark.read.format("maillog").load(out).orderBy("seq").collect()
    ]
    assert back == ["new 0", "new 1", "new 2"]


def test_maillog_append_into_nonempty_raises(spark, tmp_path):
    """Append into a directory that already holds part files would
    interleave two jobs' rotation orders — the commit refuses, and the
    previous snapshot survives untouched."""
    register_maillog(spark)
    out = str(tmp_path / "ap")
    df = spark.createDataFrame([("one",)], "value string").coalesce(1)
    _write_maillog(df, out, "append")
    before = sorted(os.listdir(out))
    with pytest.raises(Exception, match="rotation orders|overwrite"):
        _write_maillog(df, out, "append")
    # the failed job's staged files are swept (commit sweeps its own tag
    # before raising — not dependent on Spark invoking abort afterwards)
    after = sorted(os.listdir(out))
    assert not [n for n in after if n.startswith(".staged-")]
    assert after == before
    back = [r.value for r in spark.read.format("maillog").load(out).collect()]
    assert back == ["one"]


def test_maillog_stream_one_file_per_batch(spark, tmp_path):
    """The streaming reader ingests one rotated file per micro-batch,
    carries the batch-reader's (file, seq, value) contract, and the
    consumed-file offset advances across batches."""
    import uuid

    register_maillog(spark)
    d = tmp_path / "rot"
    d.mkdir()
    (d / "m.log.00").write_text("a0\na1\n")
    (d / "m.log.01").write_text("b0\n")
    (d / "m.log.02").write_text("c0\nc1\nc2\n")
    qname = f"mls_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("maillog")
        .option("maxFilesPerBatch", "1")
        .load(str(d))
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = {p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0}
        assert len(batches) == 3  # one file per micro-batch
    finally:
        q.stop()
    rows = spark.table(qname).orderBy("seq").collect()
    assert [r.value for r in rows] == ["a0", "a1", "b0", "c0", "c1", "c2"]
    # sparse seq: file index in the high bits, line number low
    assert [r.seq for r in rows] == [0, 1, 1 << 40, 2 << 40, (2 << 40) + 1, (2 << 40) + 2]


def _read_partitions_in_tasks(spark, reader, parts):
    """Run reader.read(partition) INSIDE Spark tasks (one per partition)
    and return the row tuples in (partition, line) order — the executor
    path the partition-based API contracts."""
    if not parts:
        return []
    rdd = spark.sparkContext.parallelize(parts, len(parts))
    return (
        rdd.flatMap(lambda p: list(reader.read(p)))
        .sortBy(lambda t: t[1])
        .collect()
    )


def test_maillog_stream_replay_is_deterministic(spark, tmp_path):
    """partitions(start, end) + read(partition) must reproduce exactly
    the rows of the delta between two offsets — the exactly-once replay
    contract of the partition-based stream reader."""
    from postfix_log_parser_spark.sources.maillog import MailLogStreamReader

    d = tmp_path / "rot2"
    d.mkdir()
    (d / "x.log").write_text("x0\n")
    (d / "y.log").write_text("y0\ny1\n")
    r = MailLogStreamReader({"path": str(d), "maxfilesperbatch": "1"})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    o2 = r.latestOffset()
    assert o1 == {"consumed": ["x.log"]}
    assert o2 == {"consumed": ["x.log", "y.log"]}
    # idle source: offset unchanged once everything is claimed
    assert r.latestOffset() == o2

    def values(start, end):
        return [t[2] for t in
                _read_partitions_in_tasks(spark, r, r.partitions(start, end))]

    # replay each delta and the combined range — and replay them AGAIN
    assert values(o0, o1) == ["x0"]
    assert values(o1, o2) == ["y0", "y1"]
    assert values(o0, o2) == ["x0", "y0", "y1"]
    assert values(o0, o2) == ["x0", "y0", "y1"]
    assert r.partitions(o2, o2) == []


def test_maillog_stream_read_runs_in_executor_tasks(spark, tmp_path):
    """The runtime guarantee the partition-based upgrade exists for:
    read(partition) refuses to run outside a Spark task (driver-side),
    and succeeds inside one — file bytes never materialize on the
    driver."""
    from postfix_log_parser_spark.sources.maillog import MailLogStreamReader

    d = tmp_path / "rot3"
    d.mkdir()
    (d / "z.log").write_text("z0\nz1\n")
    r = MailLogStreamReader({"path": str(d)})
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    assert len(parts) == 1
    with pytest.raises(AssertionError, match="executor task"):
        list(r.read(parts[0]))  # driver-side call is refused
    rows = _read_partitions_in_tasks(spark, r, parts)
    assert [t[2] for t in rows] == ["z0", "z1"]


def test_maillog_stream_restart_through_checkpoint(spark, tmp_path):
    """Full engine-level restart: a SECOND streaming query on the same
    checkpoint (fresh MailLogStreamReader instance) resumes from the
    committed offsets — already-consumed files are not re-emitted, a
    newly arrived file is, and seq bases continue from the checkpointed
    offset positions."""
    import uuid

    register_maillog(spark)
    d = tmp_path / "rot_ck"
    d.mkdir()
    (d / "a.log").write_text("a0\n")
    (d / "b.log").write_text("b0\nb1\n")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("maillog").load(str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out)

    first = run_once()
    assert sorted(r.value for r in first.collect()) == ["a0", "b0", "b1"]
    # restart with no new data: nothing re-emitted
    again = run_once()
    assert again.count() == 3
    # restart after a new rotation file arrives: only the delta appears
    (d / "c.log").write_text("c0\n")
    third = run_once().orderBy("seq").collect()
    assert [r.value for r in third] == ["a0", "b0", "b1", "c0"]
    assert [r.seq for r in third] == [0, 1 << 40, (1 << 40) + 1, 2 << 40]


def test_maillog_stream_restart_reconciliation(spark, tmp_path):
    """A fresh reader (post-restart) must adopt the checkpointed offset
    list as the authoritative claim prefix: replaying the checkpointed
    range emits the same rows, and the next latestOffset claims only
    genuinely new files — no row is ever re-emitted."""
    from postfix_log_parser_spark.sources.maillog import MailLogStreamReader

    d = tmp_path / "rot4"
    d.mkdir()
    (d / "r.log.00").write_text("r0\n")
    (d / "r.log.01").write_text("s0\n")
    r1 = MailLogStreamReader({"path": str(d), "maxfilesperbatch": "1"})
    o0 = r1.initialOffset()
    o1 = r1.latestOffset()
    o2 = r1.latestOffset()
    # "restart": new reader instance, empty claim list, checkpointed o1/o2
    r2 = MailLogStreamReader({"path": str(d), "maxfilesperbatch": "1"})
    replay = _read_partitions_in_tasks(spark, r2, r2.partitions(o1, o2))
    assert [t[2] for t in replay] == ["s0"]
    assert [t[1] for t in replay] == [1 << 40]  # seq base = offset position
    # post-adoption, latestOffset never re-claims checkpointed files
    (d / "r.log.02").write_text("t0\n")
    o3 = r2.latestOffset()
    assert o3 == {"consumed": ["r.log.00", "r.log.01", "r.log.02"]}
    fresh = _read_partitions_in_tasks(spark, r2, r2.partitions(o2, o3))
    assert [t[2] for t in fresh] == ["t0"]


# ---------------------------------------------------------------------------
# stream WRITER — exactly-once relay sink
# ---------------------------------------------------------------------------


def _stream_relay(spark, in_dir, out_dir, ckpt):
    """Run a maillog→maillog relay to completion (one file per batch)."""
    register_maillog(spark)
    q = (
        spark.readStream.format("maillog")
        .option("maxFilesPerBatch", "1")
        .load(in_dir)
        .select("value")
        .writeStream.format("maillog")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_maillog_stream_writer_relay_preserves_order(spark, tmp_path):
    """Relayed directory replays the input's global line order: output
    names are (batchId, partitionId)-sorted, batches follow rotation
    order, and a batch read of the relay equals a batch read of the
    source."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    (src / "m.log.00").write_text("a0\na1\n")
    (src / "m.log.01").write_text("b0\n")
    (src / "m.log.02").write_text("c0\nc1\nc2\n")
    _stream_relay(spark, str(src), str(dst), str(tmp_path / "ckpt"))
    names = sorted(os.listdir(dst))
    assert "_committed_batches" in names
    parts = [n for n in names if n.startswith("part-")]
    assert parts == [
        "part-00000-00000.log",
        "part-00001-00000.log",
        "part-00002-00000.log",
    ]
    assert not [n for n in names if n.startswith(".staged-")]
    got = [
        r.value
        for r in spark.read.format("maillog").load(str(dst)).orderBy("seq").collect()
    ]
    assert got == ["a0", "a1", "b0", "c0", "c1", "c2"]
    # manifest records each committed batch id exactly once
    ids = (dst / "_committed_batches").read_text().split()
    assert ids == ["0", "1", "2"]


def test_maillog_stream_writer_replayed_batch_is_idempotent(spark, tmp_path):
    """commit() for an already-manifested batchId must discard the
    replay's staged files and keep the original finals byte-identical —
    the restart-replay path of exactly-once."""
    from postfix_log_parser_spark.sources.maillog import MailLogStreamWriter

    out = tmp_path / "out"
    w = MailLogStreamWriter({"path": str(out)}, overwrite=False)
    out.mkdir()
    # first attempt of batch 7
    staged1 = out / f".staged-{w.job_tag}-part-00000-1.log"
    staged1.write_text("x0\nx1\n")

    class Msg:
        def __init__(self, staged):
            self.staged = str(staged)
            self.final_name = "part-00000.log"
            self.n_lines = 2

    w.commit([Msg(staged1)], 7)
    final = out / "part-00007-00000.log"
    assert final.read_text() == "x0\nx1\n"
    # replay of batch 7 (e.g. after a driver restart): staged again
    staged2 = out / f".staged-{w.job_tag}-part-00000-2.log"
    staged2.write_text("REPLAY-DIVERGED\n")
    w.commit([Msg(staged2)], 7)
    assert final.read_text() == "x0\nx1\n"  # original stands
    assert not staged2.exists()  # replay's staging swept
    ids = (out / "_committed_batches").read_text().split()
    assert ids == ["7"]  # no duplicate manifest entry


def test_maillog_stream_writer_heals_half_committed_batch(spark, tmp_path):
    """A crash AFTER renaming some finals but BEFORE the manifest append
    leaves orphan part-<batch>-* files; the replayed commit removes them
    before renaming its own, so a recorded batch's files are exactly the
    recorded attempt's."""
    from postfix_log_parser_spark.sources.maillog import MailLogStreamWriter

    out = tmp_path / "out"
    out.mkdir()
    w = MailLogStreamWriter({"path": str(out)}, overwrite=False)
    # orphan from a crashed first attempt (no manifest entry for 3)
    (out / "part-00003-00001.log").write_text("ORPHAN\n")
    staged_path = out / f".staged-{w.job_tag}-part-00000-9.log"
    staged_path.write_text("good\n")

    class Msg:
        staged = str(staged_path)
        final_name = "part-00000.log"
        n_lines = 1

    w.commit([Msg()], 3)
    names = sorted(n for n in os.listdir(out) if n.startswith("part-"))
    assert names == ["part-00003-00000.log"]  # orphan healed away
    assert (out / "part-00003-00000.log").read_text() == "good\n"


def test_maillog_stream_writer_abort_sweeps_only_own_tag(spark, tmp_path):
    from postfix_log_parser_spark.sources.maillog import MailLogStreamWriter

    out = tmp_path / "out"
    out.mkdir()
    w = MailLogStreamWriter({"path": str(out)}, overwrite=False)
    mine = out / f".staged-{w.job_tag}-part-00000-1.log"
    mine.write_text("m\n")
    other = out / ".staged-otherjobtag-part-00000-1.log"
    other.write_text("o\n")
    w.abort([None], 5)
    assert not mine.exists()
    assert other.exists()  # a concurrent job's staging is untouched


def test_maillog_stream_writer_refuses_truncate_modes(spark, tmp_path):
    from postfix_log_parser_spark.sources.maillog import MailLogStreamWriter

    with pytest.raises(ValueError, match="append-only"):
        MailLogStreamWriter({"path": str(tmp_path)}, overwrite=True)


def test_maillog_stream_relay_restart_resumes_exactly_once(spark, tmp_path):
    """Stop the relay, add files, restart from the SAME checkpoint: the
    second query incarnation (fresh reader claim list, fresh writer
    job_tag) must continue the batch sequence without re-emitting or
    re-writing batch 0 — the end-to-end exactly-once contract across a
    restart, not just within one run."""
    src, dst, ckpt = tmp_path / "src", tmp_path / "dst", tmp_path / "ckpt"
    src.mkdir()
    (src / "m.log.00").write_text("a0\na1\n")
    _stream_relay(spark, str(src), str(dst), str(ckpt))
    first = (dst / "part-00000-00000.log").read_text()
    assert first == "a0\na1\n"
    mtime0 = os.path.getmtime(dst / "part-00000-00000.log")
    # new rotated files arrive while the relay is DOWN
    (src / "m.log.01").write_text("b0\n")
    (src / "m.log.02").write_text("c0\nc1\n")
    _stream_relay(spark, str(src), str(dst), str(ckpt))
    parts = sorted(n for n in os.listdir(dst) if n.startswith("part-"))
    got = [
        r.value
        for r in spark.read.format("maillog").load(str(dst)).orderBy("seq").collect()
    ]
    assert got == ["a0", "a1", "b0", "c0", "c1"]
    # batch 0's file was not rewritten by the restart
    assert os.path.getmtime(dst / "part-00000-00000.log") == mtime0
    ids = (dst / "_committed_batches").read_text().split()
    assert sorted(set(ids)) == ids, "manifest must not duplicate batch ids"
    assert len(parts) == len(ids)


# ---------------------------------------------------------------------------
# splitBytes — byte-range partitions for giant unrotated files
# ---------------------------------------------------------------------------


def test_maillog_splitbytes_differential_no_loss_no_dup(spark, tmp_path):
    """For every split size, the byte-range read yields exactly the
    unsplit read's lines in the same seq order — the Hadoop
    next-newline-handshake property (no line lost or duplicated at any
    boundary), including empty lines, multi-byte UTF-8, and a final
    line without a trailing newline."""
    register_maillog(spark)
    p = tmp_path / "big.log"
    content = "first\n\nsecond line is longer\nüñïçødé ✓ line\nx\ny\nlast-no-nl"
    p.write_bytes(content.encode("utf-8"))
    expected = content.split("\n")
    baseline = [
        r.value
        for r in spark.read.format("maillog").load(str(p)).orderBy("seq").collect()
    ]
    assert baseline == expected
    n_bytes = len(content.encode("utf-8"))
    for split in (1, 2, 3, 5, 7, 16, 64, n_bytes, n_bytes * 2):
        df = (
            spark.read.format("maillog")
            .option("splitBytes", str(split))
            .load(str(p))
        )
        got = [(r.seq, r.value) for r in df.orderBy("seq").collect()]
        assert [v for _, v in got] == expected, f"split={split}"
        seqs = [s for s, _ in got]
        assert seqs == sorted(set(seqs)), f"split={split}: seq not strict"
        # seq IS the line-start byte offset in split mode
        offs, acc = [], 0
        for line in expected:
            offs.append(acc)
            acc += len(line.encode("utf-8")) + 1
        assert seqs == offs, f"split={split}"


def test_maillog_splitbytes_boundary_exactly_at_newline(spark, tmp_path):
    """A line starting exactly at a split boundary belongs to the new
    split (the 1-byte back-seek consumes only the previous newline)."""
    register_maillog(spark)
    p = tmp_path / "b.log"
    p.write_bytes(b"abc\ndef\n")  # split=4 puts 'def' start exactly at 4
    df = (
        spark.read.format("maillog")
        .option("splitBytes", "4").load(str(p))
    )
    assert df.rdd.getNumPartitions() == 2
    got = [(r.seq, r.value) for r in df.orderBy("seq").collect()]
    assert got == [(0, "abc"), (4, "def")]


def test_maillog_splitbytes_parallelism_and_multifile_order(spark, tmp_path):
    """Partition count = ceil(size/split) per file; global order is
    still (file name order, in-file position) across split files."""
    register_maillog(spark)
    (tmp_path / "a.log").write_text("a0\na1\na2\n")  # 9 bytes
    (tmp_path / "b.log").write_text("b0\n")  # 3 bytes
    df = (
        spark.read.format("maillog")
        .option("splitBytes", "4").load(str(tmp_path))
    )
    assert df.rdd.getNumPartitions() == 3 + 1  # ceil(9/4)=3, ceil(3/4)=1
    vals = [r.value for r in df.orderBy("seq").collect()]
    assert vals == ["a0", "a1", "a2", "b0"]


def test_maillog_splitbytes_rejects_bad_option(spark, tmp_path):
    from postfix_log_parser_spark.sources.maillog import MailLogReader

    with pytest.raises(ValueError, match="positive"):
        MailLogReader({"path": str(tmp_path), "splitbytes": "0"})


def test_maillog_splitbytes_composes_with_sessionize(spark, tmp_path):
    """The full parse+sessionize contract holds over a byte-range-split
    read: the fold orders by seq (byte offsets here) and must produce
    the same events as the per-file (dense line-number) read — proof it
    never assumes seq density."""
    from postfix_log_parser_spark.logquery import ALL_EVENTS_FIXTURE
    from postfix_log_parser_spark.operators.parse import parse_lines_arrow
    from postfix_log_parser_spark.operators.sessionize import sessionize

    register_maillog(spark)
    p = tmp_path / "mail.log"
    p.write_text(ALL_EVENTS_FIXTURE + "\n")

    def run(reader_df):
        raw = reader_df.select("value", "seq")
        events, _f, _s = sessionize(parse_lines_arrow(raw), raw_lines=raw)
        return sorted(
            (r.queue_id, str(r.timestamp), r.status, r.message_to)
            for r in events.collect()
        )

    dense = run(spark.read.format("maillog").load(str(p)))
    split = run(
        spark.read.format("maillog")
        .option("splitBytes", "700")
        .load(str(p))
    )
    assert dense == split and len(dense) == 7


def test_maillog_stream_late_file_seq_is_consumption_order(spark, tmp_path):
    """The documented batch/stream seq divergence (sources/maillog.py
    stream docstring): a rotation file arriving LATE whose name sorts
    before an already-consumed name keeps its CONSUMPTION-ORDER seq base
    — the stream cannot re-emit earlier files, and the checkpointed
    offset list makes this stable across restarts.  A batch read of the
    same directory sorts it first (rotation-order contract)."""
    import uuid

    register_maillog(spark)
    d = tmp_path / "rot"
    d.mkdir()
    (d / "b.log").write_text("b0\n")

    got: dict = {}

    def run(qname):
        got.clear()

        def sink(batch, _bid):
            got.update({r.value: r.seq for r in batch.collect()})

        q = (
            spark.readStream.format("maillog").load(str(d))
            .writeStream.foreachBatch(sink).queryName(qname)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return dict(got)

    first = run(f"mlate1_{uuid.uuid4().hex[:8]}")
    assert first == {"b0": 0}

    # a.log arrives late — its name sorts BEFORE the consumed b.log
    (d / "a.log").write_text("a0\n")
    second = run(f"mlate2_{uuid.uuid4().hex[:8]}")
    # stream contract: consumption order — a.log gets the NEXT index
    assert second == {"a0": 1 << 40}

    # batch contract on the same directory: name-sort order
    batch = {
        r.value: r.seq
        for r in spark.read.format("maillog").load(str(d)).collect()
    }
    assert batch == {"a0": 0, "b0": 1 << 40}


def test_maillog_concurrent_batch_writers_do_not_clobber(spark, tmp_path):
    """Two jobs staging into the same directory (r9 verdict item #2):
    the first commit wins and sweeps ONLY its own job tag — the loser's
    in-flight staged files survive — and the loser's commit then refuses
    the append cleanly (single-writer contract), sweeping its own
    staging and leaving the winner's snapshot intact."""
    from postfix_log_parser_spark.sources.maillog import (
        MailLogWriter,
        _WroteFile,
    )

    register_maillog(spark)
    out = str(tmp_path / "dir")
    a = MailLogWriter({"path": out}, overwrite=False)
    b = MailLogWriter({"path": out}, overwrite=False)
    os.makedirs(out, exist_ok=True)
    # stage by hand (write() itself requires an executor TaskContext)
    sa = os.path.join(out, f"{a._staged_prefix()}part-00000-1.log")
    with open(sa, "w") as fh:
        fh.write("alpha\n")
    sb = os.path.join(out, f"{b._staged_prefix()}part-00000-7.log")
    with open(sb, "w") as fh:
        fh.write("bravo\n")

    a.commit([_WroteFile(sa, "part-00000.log", 1)])
    assert os.path.exists(sb), "winner's sweep clobbered the other job"

    with pytest.raises(ValueError, match="rotation orders|overwrite"):
        b.commit([_WroteFile(sb, "part-00000.log", 1)])
    assert not os.path.exists(sb)  # loser swept its own tag on refusal
    vals = [r.value for r in spark.read.format("maillog").load(out).collect()]
    assert vals == ["alpha"]
