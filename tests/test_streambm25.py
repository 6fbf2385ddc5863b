"""q180/q181 — maintained BM25 inverted index: restart recovery,
pruned probe plan, read-side replay dedup, term-bucket-scoped takedown,
and compaction."""

import os
import shutil

from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.streambm25 import (
    _POSTINGS_SCHEMA,
    _STATS_SCHEMA,
    _term_bucket,
    _write_wave_files,
    apply_bm25_takedown,
    compact_bm25_state,
    ingest_wave,
    probe_bm25,
    run_bm25_maintenance,
    QUERY_TERMS,
)

SF = "/root/testdata/sf0.001"


def _probe_rows(spark, work):
    return [(r.rnk, r.doc_id, r.bm25) for r in probe_bm25(spark, work).collect()]


def test_restart_folds_only_new_waves(spark, tmp_path):
    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    waves_all = str(tmp_path / "all")
    os.makedirs(waves_dir)
    os.makedirs(waves_all)
    _write_wave_files(spark, SF, waves_all)
    names = sorted(os.listdir(waves_all))

    # incarnation 1: only wave 0
    shutil.copy(f"{waves_all}/{names[0]}", f"{waves_dir}/{names[0]}")
    run_bm25_maintenance(spark, waves_dir, work)
    partial = _probe_rows(spark, work)

    for n in names[1:]:
        shutil.copy(f"{waves_all}/{n}", f"{waves_dir}/{n}")
    run_bm25_maintenance(spark, waves_dir, work)
    resumed = _probe_rows(spark, work)

    # one-shot reference over the same corpus
    ref_work = str(tmp_path / "ref")
    ref_waves = f"{ref_work}/waves"
    os.makedirs(ref_waves)
    for n in names:
        shutil.copy(f"{waves_all}/{n}", f"{ref_waves}/{n}")
    run_bm25_maintenance(spark, ref_waves, ref_work)
    oneshot = _probe_rows(spark, ref_work)

    assert resumed == oneshot
    assert resumed and resumed != partial


def test_probe_prunes_postings_to_query_term_buckets(spark, tmp_path):
    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, SF, waves_dir)
    run_bm25_maintenance(spark, waves_dir, work)

    probe = probe_bm25(spark, work)
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "term" in ln and "tf" in ln
    )
    assert "PartitionFilters:" in scan
    pf = scan.split("PartitionFilters:")[1]
    in_list = pf.split(" IN (")[1].split(")")[0]
    read_buckets = {int(v) for v in in_list.split(",")}
    term_buckets = {
        r.b for r in
        spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")
        .select(_term_bucket(F.col("term")).alias("b")).distinct().collect()
    }
    assert read_buckets <= term_buckets
    assert len(read_buckets) <= len(QUERY_TERMS)


def test_replayed_ingest_does_not_change_the_answer(spark, tmp_path):
    """Crash-replay contract: re-running a batch with the SAME tag
    appends duplicate posting/docstat rows and a duplicate stats
    increment; the probe's read-side dedup (postings by key, stats by
    tag) must make the answer invariant."""
    work = str(tmp_path / "work")
    os.makedirs(work)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    wave = docs.filter(F.col("doc_id") % 3 == 0)
    ingest_wave(spark, work, wave, tag="batch-00000000")
    before = _probe_rows(spark, work)
    stats_rows = spark.read.schema(_STATS_SCHEMA).parquet(f"{work}/stats").count()
    ingest_wave(spark, work, wave, tag="batch-00000000")  # the replay
    assert _probe_rows(spark, work) == before
    # the duplicate increment row really landed (dedup is read-side)
    assert (
        spark.read.schema(_STATS_SCHEMA).parquet(f"{work}/stats").count()
        > stats_rows
    )


def test_takedown_is_term_bucket_scoped_and_idempotent(spark, tmp_path):
    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, SF, waves_dir)
    run_bm25_maintenance(spark, waves_dir, work)
    base = _probe_rows(spark, work)

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # delete ONE doc from the probe's result set (its terms bound the
    # touched buckets)
    victim = base[0][1]
    deleted = docs.filter(F.col("doc_id") == victim)
    victim_terms = (
        spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")
    )  # superset guard below uses the doc's own terms
    from postfix_log_parser_spark.ext.streambm25 import _tokenized

    victim_buckets = {
        r.b for r in _tokenized(deleted).select(F.explode("words").alias("term"))
        .select(_term_bucket(F.col("term")).alias("b")).distinct().collect()
    }
    del victim_terms

    def snapshot():
        d = f"{work}/postings"
        out = {}
        for name in os.listdir(d):
            if not name.startswith("bucket="):
                continue
            for f in os.listdir(f"{d}/{name}"):
                p = f"{d}/{name}/{f}"
                out[p] = os.stat(p).st_mtime_ns
        return out

    before_fs = snapshot()
    apply_bm25_takedown(spark, work, deleted)
    after_fs = snapshot()
    changed = {
        int(p.split("bucket=")[1].split("/")[0])
        for p in (set(before_fs) ^ set(after_fs))
        | {p for p in before_fs if p in after_fs and before_fs[p] != after_fs[p]}
    }
    assert changed <= victim_buckets, (changed, victim_buckets)

    after = _probe_rows(spark, work)
    assert victim not in {d for _r, d, _s in after}
    assert after != base

    # no deleted posting survives anywhere
    left = (
        spark.read.schema(_POSTINGS_SCHEMA).parquet(f"{work}/postings")
        .filter(F.col("doc_id") == victim).count()
    )
    assert left == 0
    # idempotent: nothing indexed for the victim anymore
    fs2 = snapshot()
    apply_bm25_takedown(spark, work, deleted)
    assert snapshot() == fs2
    assert _probe_rows(spark, work) == after


def test_compaction_bounds_files_and_drops_duplicates(spark, tmp_path):
    work = str(tmp_path / "work")
    os.makedirs(work)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    wave = docs.filter(F.col("doc_id") % 3 == 0)
    ingest_wave(spark, work, wave, tag="batch-00000000")
    ingest_wave(spark, work, wave, tag="batch-00000000")  # replay dup
    before = _probe_rows(spark, work)
    dup_rows = (
        spark.read.schema(_POSTINGS_SCHEMA).parquet(f"{work}/postings").count()
    )
    res = compact_bm25_state(spark, work, max_files=1)
    assert res["postings"] > 0
    after_rows = (
        spark.read.schema(_POSTINGS_SCHEMA).parquet(f"{work}/postings").count()
    )
    assert after_rows < dup_rows  # duplicates physically dropped
    assert _probe_rows(spark, work) == before
    d = f"{work}/postings"
    for name in os.listdir(d):
        if name.startswith("bucket="):
            parts = [p for p in os.listdir(f"{d}/{name}") if p.endswith(".parquet")]
            assert len(parts) <= 1


def test_auto_compaction_in_maintenance_loop_bounds_files(spark, tmp_path):
    """r11 verdict #2: maintenance is wired in, not an operator chore.
    20 single-file waves stream through run_bm25_maintenance with NO
    manual compaction calls; per-bucket file counts AND the stats/
    increment log stay bounded, and the probe answers exactly like an
    uncompacted twin."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
    )

    def write_waves(waves_dir, n_waves=20):
        os.makedirs(waves_dir, exist_ok=True)
        for w in range(n_waves):
            stage = f"{waves_dir}.stage{w}"
            (
                docs.filter(F.col("doc_id") % n_waves == w)
                .repartition(1)
                .write.mode("overwrite").parquet(stage)
            )
            part = next(
                n for n in sorted(os.listdir(stage))
                if n.startswith("part-") and n.endswith(".parquet")
            )
            os.replace(f"{stage}/{part}", f"{waves_dir}/wave-{w:02d}.parquet")
            shutil.rmtree(stage)

    work = str(tmp_path / "auto")
    write_waves(f"{work}/waves")
    run_bm25_maintenance(spark, f"{work}/waves", work, compact_every=4)

    ref = str(tmp_path / "ref")
    write_waves(f"{ref}/waves")
    run_bm25_maintenance(spark, f"{ref}/waves", ref, compact_every=0)

    assert _probe_rows(spark, work) == _probe_rows(spark, ref)
    # bounded: the last compaction ran at batch 19, so nothing holds
    # more than max_files + compact_every files; the uncompacted twin
    # holds ~20 stats files
    stats_files = [
        p for p in os.listdir(f"{work}/stats") if p.endswith(".parquet")
    ]
    ref_stats_files = [
        p for p in os.listdir(f"{ref}/stats") if p.endswith(".parquet")
    ]
    assert len(stats_files) <= 8 < len(ref_stats_files)
    for name in os.listdir(f"{work}/postings"):
        if name.startswith("bucket="):
            parts = [
                p for p in os.listdir(f"{work}/postings/{name}")
                if p.endswith(".parquet")
            ]
            assert len(parts) <= 8, name


def test_takedown_crash_before_apply_recovers_from_frozen_txn(
    spark, tmp_path, monkeypatch
):
    """The r11 ADVICE crash window, closed: a takedown that froze its
    txn but crashed before (or mid-) apply converges at the next open —
    the probe never sees the half-applied state, and N/avgdl carry the
    decrement exactly once."""
    import postfix_log_parser_spark.ext.streambm25 as sb

    def build(workdir):
        waves = f"{workdir}/waves"
        os.makedirs(waves)
        _write_wave_files(spark, SF, waves)
        run_bm25_maintenance(spark, waves, workdir)

    work = str(tmp_path / "crash")
    twin = str(tmp_path / "twin")
    build(work)
    build(twin)
    base = _probe_rows(spark, work)
    victim = base[0][1]
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    deleted = docs.filter(F.col("doc_id") == victim)

    # crash #1: freeze completes, apply never runs
    monkeypatch.setattr(sb, "_apply_bm25_txn", lambda *a, **k: None)
    apply_bm25_takedown(spark, work, deleted)
    monkeypatch.undo()
    troot = f"{work}/_txn"
    assert os.path.isdir(troot) and len(os.listdir(troot)) == 1

    # the reference: the same takedown applied normally on the twin
    apply_bm25_takedown(spark, twin, deleted)
    want = _probe_rows(spark, twin)

    # next open converges the pending txn before answering
    got = _probe_rows(spark, work)
    assert got == want
    assert not os.path.isdir(troot) or not os.listdir(troot)
    # the decrement landed exactly once: stats totals agree with twin
    def totals(w):
        return (
            spark.read.schema(_STATS_SCHEMA).parquet(f"{w}/stats")
            .groupBy("tag")
            .agg(F.max("n_docs").alias("n"), F.max("sum_dl").alias("s"))
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
            .collect()[0]
        )
    assert tuple(totals(work)) == tuple(totals(twin))


def test_takedown_crash_after_rewrites_before_stats_still_decrements(
    spark, tmp_path, monkeypatch
):
    """The EXACT r11 ADVICE scenario: crash after the bucket rewrites
    but before the stats append.  Pre-r12 the re-apply was a no-op
    (idempotency gate saw nothing left to delete) and N/avgdl stayed
    overstated forever; with the frozen txn, recovery replays the
    decrement from the frozen rows."""
    import postfix_log_parser_spark.ext.streambm25 as sb

    def build(workdir):
        waves = f"{workdir}/waves"
        os.makedirs(waves)
        _write_wave_files(spark, SF, waves)
        run_bm25_maintenance(spark, waves, workdir)

    work = str(tmp_path / "crash2")
    twin = str(tmp_path / "twin2")
    build(work)
    build(twin)
    victim = _probe_rows(spark, work)[0][1]
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    deleted = docs.filter(F.col("doc_id") == victim)

    real_append = sb._append_stats

    def boom(*a, **k):
        raise RuntimeError("crash before stats append")

    monkeypatch.setattr(sb, "_append_stats", boom)
    try:
        apply_bm25_takedown(spark, work, deleted)
    except RuntimeError:
        pass
    monkeypatch.setattr(sb, "_append_stats", real_append)
    # buckets already rewritten, stats not yet decremented, txn pending
    assert os.listdir(f"{work}/_txn")

    apply_bm25_takedown(spark, twin, deleted)
    want = _probe_rows(spark, twin)
    got = _probe_rows(spark, work)  # recovery converges first
    assert got == want

    def totals(w):
        return tuple(
            spark.read.schema(_STATS_SCHEMA).parquet(f"{w}/stats")
            .groupBy("tag")
            .agg(F.max("n_docs").alias("n"), F.max("sum_dl").alias("s"))
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
            .collect()[0]
        )
    assert totals(work) == totals(twin)


def test_layout_migration_resumable_and_probe_follows_manifest(spark, tmp_path):
    """q182's core (r12): a maintained 16-bucket index migrated to a
    48-bucket layout answers identically; the probe's bucket planning
    follows the MIGRATED store's manifest; a crash-resumed migration
    (re-doing an unmarked source partition) does not duplicate rows;
    and opening the migrated store under the old layout refuses."""
    from postfix_log_parser_spark.ext.statetable import (
        StateLayoutError,
        StateTable,
    )
    from postfix_log_parser_spark.ext.streambm25 import (
        MIGRATED_BUCKETS,
        N_TERM_BUCKETS,
        _POSTINGS_SCHEMA as PSCHEMA,
        migrate_bm25_store,
    )
    import pytest as _pytest

    src = str(tmp_path / "src")
    waves = f"{src}/waves"
    os.makedirs(waves)
    _write_wave_files(spark, SF, waves)
    run_bm25_maintenance(spark, waves, src)
    base = _probe_rows(spark, src)

    dst = str(tmp_path / "dst")
    migrate_bm25_store(spark, src, dst)
    assert _probe_rows(spark, dst) == base and base

    # the probe planned against the 48-bucket layout, not the 16-bucket
    # constant: recorded manifest says 48 and at least one partition dir
    # sits above the old bucket range
    import json as _json
    with open(f"{dst}/postings/_manifest.json") as fh:
        assert _json.load(fh)["n_buckets"] == MIGRATED_BUCKETS
    dirs = {
        int(d.split("=")[1]) for d in os.listdir(f"{dst}/postings")
        if d.startswith("bucket=")
    }
    assert max(dirs) >= N_TERM_BUCKETS

    # crash-resume: drop one source partition's done-marker and re-run —
    # the deterministic file names overwrite the earlier copies, so row
    # counts and answers are unchanged
    rows_before = (
        spark.read.schema(PSCHEMA).parquet(f"{dst}/postings").count()
    )
    markers = sorted(os.listdir(f"{dst}/postings/_migrated"))
    os.remove(f"{dst}/postings/_migrated/{markers[0]}")
    migrate_bm25_store(spark, src, dst)
    assert (
        spark.read.schema(PSCHEMA).parquet(f"{dst}/postings").count()
        == rows_before
    )
    assert _probe_rows(spark, dst) == base

    # the refusal the migration exists to satisfy: the old layout
    # cannot open the migrated store
    with _pytest.raises(StateLayoutError):
        StateTable(
            spark, f"{dst}/postings", PSCHEMA,
            partition_col="bucket", n_buckets=N_TERM_BUCKETS,
            key_desc="pmod(xxhash64(term), n_buckets)",
        ).read()
