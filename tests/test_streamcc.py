"""q173 streaming component maintenance — restart recovery.

The maintenance loop's whole value is that state OUTLIVES the query:
waves that arrive after a stop must fold into the map the earlier
incarnation left behind, through the stream checkpoint (consumed-file
tracking) and the three state tables.  This test runs the loop, stops,
adds the remaining waves, resumes with the SAME work dir, and requires
the final map to byte-match the single-pass run — and to contain a
cross-incarnation component (a pair whose members arrived in different
query incarnations).  State = five tables since r11: bands, shingles,
pairs, the comp-keyed map, and its doc-bucketed mirror."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.streamcc import (
    _write_wave_files,
    q173_stream_components,
    run_maintenance,
)


def test_restart_resumes_from_checkpointed_waves(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    work = str(tmp_path / "work")
    waves_all = str(tmp_path / "all")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    os.makedirs(waves_all)
    _write_wave_files(spark, sf, waves_all)
    names = sorted(os.listdir(waves_all))
    assert len(names) >= 3

    # incarnation 1: only the first wave has arrived
    shutil.copy(f"{waves_all}/{names[0]}", f"{waves_dir}/{names[0]}")
    partial = {
        (r.doc_id, r.component_id)
        for r in run_maintenance(spark, waves_dir, work).collect()
    }

    # the remaining waves arrive while no query is running
    for n in names[1:]:
        shutil.copy(f"{waves_all}/{n}", f"{waves_dir}/{n}")

    # incarnation 2: same work dir — checkpoint skips the consumed wave
    resumed = {
        (r.doc_id, r.component_id)
        for r in run_maintenance(spark, waves_dir, work).collect()
    }

    # reference: the one-shot query on the same corpus
    oneshot = {
        (r.doc_id, r.component_id)
        for r in q173_stream_components(spark, sf).collect()
    }
    assert resumed == oneshot
    assert resumed, "corpus must produce components"
    # incarnation 1 saw only wave 0, so every pair whose members live in
    # different waves (doc_id % 3 differs — all planted twins do: the
    # +100000 offset shifts the wave by 1) was found AFTER the restart
    assert len(resumed) > len(partial)

    # cross-wave components prove the index lookup reached state written
    # by a different micro-batch (and, given the restart point, by a
    # different query incarnation for wave-0 members)
    comps: dict = {}
    for d, c in resumed:
        comps.setdefault(c, set()).add(d % 3)
    assert any(len(waves) > 1 for waves in comps.values()), (
        "no component spans waves — cross-batch merging not exercised"
    )


def test_probe_plan_prunes_index_and_broadcasts_wave(spark, tmp_path):
    """The layout's plan contract (r9 verdict item #1): the band-index
    side of the per-batch probe must be (a) PRUNED to the wave's
    buckets — a PartitionFilters entry on the bucket column — and
    (b) joined via a BROADCAST of the wave side, so the index subtree
    carries ZERO shuffle exchange and zero sort at any corpus size."""
    from pyspark.sql import functions as F

    from postfix_log_parser_spark.ext.dedup import _minhash_bands, shingles3_udf
    from postfix_log_parser_spark.ext.streamcc import (
        _bucket_of,
        _probe_candidates,
        _tables,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc {i}")
         for i in range(12)],
        "doc_id long, text string",
    )
    sh = docs.select(
        "doc_id", shingles3_udf(F.col("text")).alias("shingles")
    ).filter(F.size("shingles") > 0)
    bands = _minhash_bands(sh).withColumn("bucket", _bucket_of(F.col("band_key")))
    bands_dir = str(tmp_path / "bands")
    bands.filter(F.col("doc_id") < 8).write.partitionBy("bucket").parquet(bands_dir)

    wave = bands.filter(F.col("doc_id") >= 8).persist()
    wave.count()  # materialize, as merge_wave does before probing
    probe = _probe_candidates(_tables(spark, str(tmp_path))["bands"], wave)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    wave.unpersist()

    assert "BroadcastHashJoin" in plan
    # no shuffle anywhere in the probe — the only exchange is the
    # broadcast of the wave side.  (The InMemoryRelation suffix is the
    # cached wave's HISTORICAL build lineage, printed but not executed —
    # the executed probe reads the InMemoryTableScan above it.)
    executed = plan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in executed
    assert "Exchange hashpartitioning" not in executed
    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "bands" in ln
    )
    assert "PartitionFilters:" in scan
    pf = scan.split("PartitionFilters:")[1]
    assert "bucket" in pf and pf.strip()[:3] != "[],"


def test_probe_never_self_matches_replayed_wave(spark, tmp_path):
    """Replay safety: a crash after the band append but before the
    checkpoint commit replays the wave against an index that already
    CONTAINS the wave's own rows.  The probe's doc_id inequality must
    keep a doc from matching its own band entries — otherwise every
    replayed doc yields a verified Jaccard-1.0 self-pair and q175's
    residual CC emits spurious (x, x) singleton rows."""
    from postfix_log_parser_spark.ext.dedup import _minhash_bands, shingles3_udf
    from postfix_log_parser_spark.ext.streamcc import (
        _bucket_of,
        _probe_candidates,
        _tables,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc {i}")
         for i in range(6)],
        "doc_id long, text string",
    )
    sh = docs.select(
        "doc_id", shingles3_udf(F.col("text")).alias("shingles")
    ).filter(F.size("shingles") > 0)
    bands = _minhash_bands(sh).withColumn(
        "bucket", _bucket_of(F.col("band_key"))
    ).persist()
    bands_dir = str(tmp_path / "bands")
    # the index already holds the WHOLE wave (the replayed-batch state)
    bands.write.partitionBy("bucket").parquet(bands_dir)

    got = _probe_candidates(_tables(spark, str(tmp_path))["bands"], bands).collect()
    bands.unpersist()
    assert got, "identical docs must still cross-match"
    assert all(r.id_a != r.id_b for r in got), (
        "replayed wave self-matched its own band rows"
    )


def test_stage_eviction_releases_work_dir(spark):
    """The _MV_STAGE ↔ _MV_WORK lifecycle lockstep: when the LRU evicts
    (or clear_stages drops) a staged q173 entry, its work directory is
    removed from disk and from the atexit sweep list — no unbounded
    side-dict growth across corpora."""
    from postfix_log_parser_spark.ext import streamcc

    fake_key = ("app", "corpus", ())
    fake_dir = tempfile.mkdtemp(prefix="evict_probe_")
    streamcc._MV_WORK[fake_key] = fake_dir
    streamcc._WORK_DIRS.append(fake_dir)
    try:
        streamcc._evict_mv_work(fake_key, None)
        assert fake_key not in streamcc._MV_WORK
        assert fake_dir not in streamcc._WORK_DIRS
        assert not os.path.exists(fake_dir)
        # wired into the cache: overflow/clear must fire the callback
        assert streamcc._MV_STAGE._on_evict is streamcc._evict_mv_work
    finally:
        shutil.rmtree(fake_dir, ignore_errors=True)


def test_single_component_wave_rewrites_at_most_one_map_bucket(spark, tmp_path):
    """The component map is hash-partitioned by component_id and updated
    with partition-scoped dynamic overwrite: a wave that only grows ONE
    component rewrites at most one bucket directory (r9 verdict item #1's
    'Done' pin).  The band/shingle stores append, never rewrite."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, sf, waves_dir)
    base = {r.doc_id: r.component_id for r in
            run_maintenance(spark, waves_dir, work).collect()}
    assert base, "corpus must produce components"

    comp_dir = f"{work}/components"

    def snapshot(d):
        out = {}
        for root, _dirs, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = snapshot(comp_dir)

    # the late wave: ONE exact copy of an already-clustered original doc
    # — identical shingles, identical bands, Jaccard 1.0 — so the only
    # change is one added row in that component's bucket
    target = min(d for d in base if d < 100000)
    text = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("doc_id") == target).select("text").head()[0]
    )
    pq.write_table(
        pa.table({"doc_id": pa.array([900001], "int64"),
                  "text": pa.array([text], "string")}),
        f"{waves_dir}/wave-99.parquet",
    )
    after_map = {r.doc_id: r.component_id for r in
                 run_maintenance(spark, waves_dir, work).collect()}
    assert after_map[900001] == base[target]  # joined the right component
    assert {d: c for d, c in after_map.items() if d != 900001} == base

    after = snapshot(comp_dir)
    changed_buckets = {
        p.split("bucket=")[1].split("/")[0]
        for p in (set(before) ^ set(after)
                  | {p for p in before if p in after and before[p] != after[p]})
        if "bucket=" in p
    }
    assert len(changed_buckets) <= 1, changed_buckets


def test_endpoint_lookup_prunes_mirror_and_broadcasts_ids(spark, tmp_path):
    """The r10 verdict's last corpus-proportional term, closed: the
    merge core's doc→component endpoint lookup must read the
    doc-bucketed MIRROR pruned to the lookup ids' buckets (a
    PartitionFilters entry on the bucket column) with the ids side
    broadcast — so a one-doc wave with one existing endpoint reads at
    most TWO mirror bucket directories, at any corpus size."""
    from postfix_log_parser_spark.ext.streamcc import (
        _bucket_of,
        _lookup_components,
        _update_components,
    )

    work = str(tmp_path / "w")
    os.makedirs(work)
    # a map with many components spread over many buckets
    pairs = spark.createDataFrame(
        [(i, i + 1000) for i in range(1, 60)], "id_a long, id_b long"
    )
    _update_components(spark, work, pairs, "seed")

    # a one-doc wave pairing with ONE existing doc: two endpoint ids
    ep = spark.createDataFrame([(7,), (900001,)], "doc_id long")
    looked = _lookup_components(spark, work, ep)
    assert {(r.doc_id, r.component_id) for r in looked.collect()} == {(7, 7)}

    plan = looked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the mirror scan is the plan's only FileScan (match on columns, not
    # the Location path — pytest tmp paths overflow the 100-char plan
    # metadata truncation)
    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "component_id" in ln
    )
    assert "PartitionFilters:" in scan
    pf = scan.split("PartitionFilters:")[1]
    assert "bucket" in pf and pf.strip()[:3] != "[],"

    # the filter's IN-list is the exact set of bucket directories the
    # scan reads: it must be the two ids' buckets, nothing more
    ep_buckets = {
        r.b for r in ep.select(_bucket_of(F.col("doc_id")).alias("b")).collect()
    }
    in_list = pf.split(" IN (")[1].split(")")[0]
    read_buckets = {int(v) for v in in_list.split(",")}
    assert read_buckets <= ep_buckets
    assert len(read_buckets) <= 2


def test_mirror_stays_consistent_with_component_map(spark, tmp_path):
    """components_by_doc/ must hold exactly the comp-keyed map's rows
    after ingest waves AND after a takedown — the lockstep invariant the
    two-phase txn exists to guarantee."""
    from postfix_log_parser_spark.ext.streamcc import (
        _COMP_SCHEMA,
        _MIRROR_SCHEMA,
        apply_takedown,
    )

    sf = "/root/testdata/sf0.001"
    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, sf, waves_dir)

    def rows(d, schema):
        return {
            (r.doc_id, r.component_id)
            for r in spark.read.schema(schema).parquet(d)
            .select("doc_id", "component_id").collect()
        }

    got = {
        (r.doc_id, r.component_id)
        for r in run_maintenance(spark, waves_dir, work).collect()
    }
    assert got, "corpus must produce components"
    assert rows(f"{work}/components", _COMP_SCHEMA) == got
    assert rows(f"{work}/components_by_doc", _MIRROR_SCHEMA) == got

    deleted = spark.createDataFrame(
        [(d,) for d, _ in sorted(got)[:3]], "doc_id long"
    )
    after = {
        (r.doc_id, r.component_id)
        for r in apply_takedown(spark, work, deleted).collect()
    }
    assert after != got
    assert rows(f"{work}/components", _COMP_SCHEMA) == after
    assert rows(f"{work}/components_by_doc", _MIRROR_SCHEMA) == after


def test_pending_txn_recovery_converges_both_layouts(spark, tmp_path):
    """Crash recovery: a FROZEN txn that advanced the comp-keyed map but
    crashed before the mirror (simulated by restoring the mirror's
    pre-state) must be re-applied by _recover_pending_txns until both
    layouts agree; an UNFROZEN txn (no _SUCCESS) is discarded."""
    from postfix_log_parser_spark.ext.streamcc import (
        _COMP_SCHEMA,
        _MIRROR_SCHEMA,
        _commit_map_txn,
        _recover_pending_txns,
        _update_components,
    )

    work = str(tmp_path / "w")
    os.makedirs(work)
    p1 = spark.createDataFrame([(10, 20), (30, 40)], "id_a long, id_b long")
    _update_components(spark, work, p1, "seed")
    mirror_dir = f"{work}/components_by_doc"
    pre_mirror = str(tmp_path / "pre_mirror")
    shutil.copytree(mirror_dir, pre_mirror)

    # a txn that merges {30,40} into comp 10 — applied fully...
    delta = spark.createDataFrame(
        [(30, 30, 10), (40, 30, 10)], "doc_id long, old_comp long, new_comp long"
    )
    _commit_map_txn(spark, work, delta, "merge1")
    want = {(10, 10), (20, 10), (30, 10), (40, 10)}

    def rows(d, schema):
        return {
            (r.doc_id, r.component_id)
            for r in spark.read.schema(schema).parquet(d)
            .select("doc_id", "component_id").collect()
        }

    assert rows(f"{work}/components", _COMP_SCHEMA) == want
    assert rows(mirror_dir, _MIRROR_SCHEMA) == want

    # ...now simulate the crash: mirror rolled back to pre-state, txn
    # still frozen on disk
    shutil.rmtree(mirror_dir)
    shutil.copytree(pre_mirror, mirror_dir)
    assert rows(mirror_dir, _MIRROR_SCHEMA) != want
    delta.select("doc_id", "old_comp", "new_comp").repartition(1) \
        .write.mode("overwrite").parquet(f"{work}/_txn/merge1")
    # an incomplete freeze alongside it must be discarded, not applied
    os.makedirs(f"{work}/_txn/halfbaked")
    _recover_pending_txns(spark, work)
    assert rows(f"{work}/components", _COMP_SCHEMA) == want  # re-apply no-op
    assert rows(mirror_dir, _MIRROR_SCHEMA) == want  # mirror caught up
    assert not os.path.exists(f"{work}/_txn/merge1")
    assert not os.path.exists(f"{work}/_txn/halfbaked")


def test_update_components_sweeps_drained_bucket(spark, tmp_path):
    """A merge can move EVERY row out of a bucket (the old component id
    relabels to an id hashing elsewhere); dynamic overwrite writes
    nothing there, so the updater must sweep the stale directory — else
    the next batch would read resurrected rows."""
    from pyspark.sql import functions as F

    from postfix_log_parser_spark.ext.streamcc import (
        N_STATE_BUCKETS,
        _update_components,
    )

    def bucket(i):
        return spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(i).cast("long")), F.lit(N_STATE_BUCKETS))
        ).head()[0]

    work = str(tmp_path / "work")
    os.makedirs(work)
    comp_dir = f"{work}/components"
    # component {50, 60} → comp 50
    p1 = spark.createDataFrame([(50, 60)], "id_a long, id_b long")
    _update_components(spark, work, p1, "t1")
    # pick k < 50 whose bucket differs from bucket(50): the merge moves
    # every row out of bucket(50)
    k = next(i for i in range(49, 0, -1) if bucket(i) != bucket(50))
    p2 = spark.createDataFrame([(k, 50)], "id_a long, id_b long")
    _update_components(spark, work, p2, "t2")

    got = {(r.doc_id, r.component_id) for r in
           spark.read.parquet(comp_dir).select("doc_id", "component_id").collect()}
    assert got == {(50, k), (60, k), (k, k)}
    assert not os.path.exists(f"{comp_dir}/bucket={bucket(50)}") or not os.listdir(
        f"{comp_dir}/bucket={bucket(50)}"
    )


def test_update_components_full_replay_is_noop(spark, tmp_path):
    """foreachBatch full-batch replay (crash after all writes, before the
    checkpoint commit): re-folding the SAME pairs against the advanced
    map must change nothing — the endpoints now map to merged
    components, so the delta graph is edgeless and both layouts stay
    put."""
    from postfix_log_parser_spark.ext.streamcc import (
        _COMP_SCHEMA,
        _MIRROR_SCHEMA,
        _update_components,
    )

    work = str(tmp_path / "w")
    os.makedirs(work)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 20)], "id_a long, id_b long"
    )
    _update_components(spark, work, pairs, "b0")

    def rows(d, schema):
        return {
            (r.doc_id, r.component_id)
            for r in spark.read.schema(schema).parquet(d)
            .select("doc_id", "component_id").collect()
        }

    want = {(1, 1), (2, 1), (3, 1), (10, 10), (20, 10)}
    assert rows(f"{work}/components", _COMP_SCHEMA) == want
    _update_components(spark, work, pairs, "b0-replay")
    assert rows(f"{work}/components", _COMP_SCHEMA) == want
    assert rows(f"{work}/components_by_doc", _MIRROR_SCHEMA) == want


def test_compact_state_bounds_file_counts_and_keeps_answers(spark, tmp_path):
    """The append-only state tables accrete one file per touched bucket
    per batch; compact_state must rewrite exactly the over-threshold
    buckets down to one file, byte-preserve the contents, and leave the
    maintenance loop fully functional (a later wave still probes, merges
    and appends correctly)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from postfix_log_parser_spark.ext.streamcc import (
        _BANDS_SCHEMA,
        _PAIRS_SCHEMA,
        _SHINGLES_SCHEMA,
        compact_state,
    )

    sf = "/root/testdata/sf0.001"
    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, sf, waves_dir)
    base = {r.doc_id: r.component_id for r in
            run_maintenance(spark, waves_dir, work).collect()}
    assert base, "corpus must produce components"

    def file_counts(table):
        d = f"{work}/{table}"
        return {
            name: sum(p.endswith(".parquet") for p in os.listdir(f"{d}/{name}"))
            for name in os.listdir(d) if name.startswith("bucket=")
        }

    def rows(table, schema):
        return frozenset(
            tuple(tuple(x) if isinstance(x, list) else x for x in r)
            for r in
            spark.read.schema(schema).parquet(f"{work}/{table}").collect()
        )

    tables = (
        ("pairs", _PAIRS_SCHEMA),
        ("bands", _BANDS_SCHEMA),
        ("shingles", _SHINGLES_SCHEMA),
    )
    assert any(
        c > 1 for t, _s in tables for c in file_counts(t).values()
    ), "3 waves must leave some multi-file bucket to compact"
    before = {t: rows(t, s) for t, s in tables}

    res = compact_state(spark, work, max_files=1)
    assert sum(res.values()) > 0
    for t, s in tables:
        assert all(c <= 1 for c in file_counts(t).values()), t
        assert rows(t, s) == before[t], f"{t} contents changed"

    # the loop still works on compacted state: a late exact-copy wave
    # joins its original's component through the compacted band index
    target = min(d for d in base if d < 100000)
    text = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("doc_id") == target).select("text").head()[0]
    )
    pq.write_table(
        pa.table({"doc_id": pa.array([900001], "int64"),
                  "text": pa.array([text], "string")}),
        f"{waves_dir}/wave-99.parquet",
    )
    after = {r.doc_id: r.component_id for r in
             run_maintenance(spark, waves_dir, work).collect()}
    assert after[900001] == base[target]
    assert {d: c for d, c in after.items() if d != 900001} == base


def test_apply_takedown_relabels_and_dissolves(spark, tmp_path):
    """q175's core against the state tables directly: deleting a chain
    component's min member relabels the survivors to the min SURVIVING
    id through residual edges; a pair component losing one member
    dissolves (the edgeless survivor drops out); re-applying the same
    takedown is a no-op."""
    from postfix_log_parser_spark.ext.streamcc import (
        _bucket_of,
        _update_components,
        apply_takedown,
    )

    work = str(tmp_path / "w")
    os.makedirs(work)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 20)], "id_a long, id_b long"
    )
    _update_components(spark, work, pairs, "t1")
    pairs.withColumn("bucket", _bucket_of(F.col("id_a"))) \
        .write.partitionBy("bucket").parquet(f"{work}/pairs")

    deleted = spark.createDataFrame([(1,), (10,)], "doc_id long")
    out = {(r.doc_id, r.component_id)
           for r in apply_takedown(spark, work, deleted).collect()}
    assert out == {(2, 2), (3, 2)}  # chain relabels; pair dissolves

    again = {(r.doc_id, r.component_id)
             for r in apply_takedown(spark, work, deleted).collect()}
    assert again == out  # idempotent
