"""StateTable — the shared bucketed-state machinery (r12, verdict #1):
layout manifest written at creation and validated on open, mismatch
refusal, partition-scoped overwrite + drained sweep, rename-swapped
compaction with replay-dedup collapse."""

import json
import os

import pytest
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.statetable import (
    MANIFEST_NAME,
    StateLayoutError,
    StateTable,
    hash_bucket,
)

_SCHEMA = "k long, v string, bucket int"


def _table(spark, path, n_buckets=4, **kw):
    kw.setdefault("key_desc", "pmod(xxhash64(k), n_buckets)")
    return StateTable(
        spark, str(path), _SCHEMA, partition_col="bucket",
        n_buckets=n_buckets, **kw,
    )


def _rows(spark, n=20, tag="a"):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("v"),
        hash_bucket(F.col("id"), 4).alias("bucket"),
    )


def test_manifest_written_at_creation_and_roundtrips(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    t.append(_rows(spark))
    mpath = os.path.join(t.path, MANIFEST_NAME)
    assert os.path.isfile(mpath)
    with open(mpath) as fh:
        m = json.load(fh)
    assert m["n_buckets"] == 4 and m["partition_col"] == "bucket"
    # a fresh instance with the same layout opens and reads fine
    back = _table(spark, tmp_path / "t").read()
    assert back.count() == 20


def test_mismatched_bucket_count_refuses_open(spark, tmp_path):
    """THE silent-mis-prune hazard (r11 verdict What's-wrong #1): a
    store written under n_buckets=4 opened by a build configured for 8
    would prune probes to the wrong buckets and silently drop rows —
    the manifest turns that into a refusal."""
    _table(spark, tmp_path / "t").append(_rows(spark))
    wrong = _table(spark, tmp_path / "t", n_buckets=8)
    with pytest.raises(StateLayoutError, match="n_buckets"):
        wrong.read()
    with pytest.raises(StateLayoutError):
        wrong.append(_rows(spark))


def test_mismatched_key_fingerprint_refuses_open(spark, tmp_path):
    """The streamann case: PQ codes stored under one codebook are
    garbage under another — the fingerprint pins it.  An opener that
    passes NO fingerprint makes no claim and is allowed through."""
    t = _table(spark, tmp_path / "t", key_fingerprint="codebook-aaaa")
    t.append(_rows(spark))
    with pytest.raises(StateLayoutError, match="key_fingerprint"):
        _table(spark, tmp_path / "t", key_fingerprint="codebook-bbbb").read()
    assert _table(spark, tmp_path / "t").read().count() == 20


def test_overwrite_partitions_sweeps_drained_only(spark, tmp_path):
    """Dynamic-overwrite advance: buckets present in new_rows are
    replaced, a touched bucket with no surviving rows is swept, and
    untouched buckets are never rewritten (mtime-pinned)."""
    t = _table(spark, tmp_path / "t")
    t.append(_rows(spark))
    all_buckets = sorted(
        int(d.split("=")[1]) for d in os.listdir(t.path)
        if d.startswith("bucket=")
    )
    assert len(all_buckets) >= 3
    drained, kept_b = all_buckets[0], all_buckets[1]
    untouched = [b for b in all_buckets if b not in (drained, kept_b)]

    def snap(b):
        d = t.partition_dir(b)
        return {f: os.stat(os.path.join(d, f)).st_mtime_ns for f in os.listdir(d)}

    before = {b: snap(b) for b in untouched}
    survivors = (
        t.read([kept_b])
        .filter(F.col("k") % 2 == 0)
        .select("k", "v", "bucket")
        .localCheckpoint(eager=True)
    )
    t.overwrite_partitions([drained, kept_b], survivors)
    assert not os.path.exists(t.partition_dir(drained))
    assert os.path.exists(t.partition_dir(kept_b))
    for b in untouched:
        assert snap(b) == before[b], f"untouched bucket {b} was rewritten"
    # total state: untouched rows + the kept bucket's survivors
    want = 20 - _rows(spark).filter(
        hash_bucket(F.col("k"), 4) == drained
    ).count() - _rows(spark).filter(
        (hash_bucket(F.col("k"), 4) == kept_b) & (F.col("k") % 2 != 0)
    ).count()
    assert t.read().count() == want


def test_compact_bounds_files_and_collapses_duplicates(spark, tmp_path):
    """Rename-swapped compaction: over-threshold buckets drop to one
    file; with dedup keys the replayed-append duplicates physically
    collapse; answers are unchanged."""
    t = _table(spark, tmp_path / "t")
    for _ in range(6):  # same rows appended 6× = replay duplicates
        t.append(_rows(spark))
    bdirs = [d for d in os.listdir(t.path) if d.startswith("bucket=")]
    assert all(
        len([p for p in os.listdir(os.path.join(t.path, d))
             if p.endswith(".parquet")]) == 6
        for d in bdirs
    )
    n = t.compact(max_files=2, dedup_keys=["k"], dedup_agg={"v": "max"})
    assert n == len(bdirs)
    for d in bdirs:
        files = [p for p in os.listdir(os.path.join(t.path, d))
                 if p.endswith(".parquet")]
        assert len(files) == 1
    assert t.read().count() == 20  # duplicates gone, content intact
    # idempotent: nothing over threshold now
    assert t.compact(max_files=2) == 0


def test_compact_crash_heal_restores_retired_dir(spark, tmp_path):
    """A crash between the two renames leaves `.old-bucket=N` as the
    only copy — the recovery sweep restores it."""
    t = _table(spark, tmp_path / "t")
    t.append(_rows(spark))
    b = next(d for d in os.listdir(t.path) if d.startswith("bucket="))
    os.rename(os.path.join(t.path, b), os.path.join(t.path, f".old-{b}"))
    t.recover_compaction()
    assert os.path.isdir(os.path.join(t.path, b))
    assert t.read().count() == 20
