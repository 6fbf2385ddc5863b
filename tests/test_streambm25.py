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
