"""q176 streaming ANN index maintenance — restart recovery and the
pruned-probe plan.

The contract harness proves maintained == rebuilt (q157's oracle); these
tests pin the operational properties: a restart folds ONLY newly-arrived
waves through the stream checkpoint, the converged store holds exactly
one code row per corpus-side vector, and the probe's scan of the store
is partition-pruned to the probe cells with the query side broadcast."""

import os
import shutil

from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.quantize import (
    _cb_lit,
    _codebook,
    _is_new_batch,
    new_batch_queries,
    probe_ivfpq,
)
from postfix_log_parser_spark.ext.similarity import _emb, _with_norm
from postfix_log_parser_spark.ext.streamann import (
    _write_wave_files,
    maintained_index,
    run_index_maintenance,
)

SF = "/root/testdata/sf0.001"


def test_stream_ann_restart_and_pruned_probe(spark, tmp_path):
    emb = _with_norm(_emb(spark, SF))
    cb = _codebook(emb)
    assert cb[0], "sf0.001 must have a codebook"
    cb_lit = _cb_lit(cb)

    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    waves_all = str(tmp_path / "all")
    os.makedirs(waves_dir)
    os.makedirs(waves_all)
    _write_wave_files(spark, SF, waves_all)
    names = sorted(os.listdir(waves_all))
    assert len(names) == 3

    # incarnation 1: one wave arrives
    shutil.copy(f"{waves_all}/{names[0]}", f"{waves_dir}/{names[0]}")
    run_index_maintenance(spark, waves_dir, work, cb_lit)
    codes = spark.read.parquet(f"{work}/codes")
    corpus = emb.filter(~_is_new_batch(F.col("vec_id")))
    n_wave0 = corpus.filter(F.col("vec_id") % 3 == 0).count()
    assert codes.count() == n_wave0

    # restart: remaining waves arrive, the checkpoint skips wave 0 —
    # exactly one code row per corpus vector, no re-encodes
    for n in names[1:]:
        shutil.copy(f"{waves_all}/{n}", f"{waves_dir}/{n}")
    run_index_maintenance(spark, waves_dir, work, cb_lit)
    codes = spark.read.parquet(f"{work}/codes")
    assert codes.count() == corpus.count()
    assert codes.select("vec_id").distinct().count() == corpus.count()

    # the probe prunes the store to the query batch's cells and rides a
    # broadcast — the scan line carries PartitionFilters on cell
    probe_cells = {
        r.probe_cell
        for r in new_batch_queries(emb, cb_lit)
        .select("probe_cell").distinct().collect()
    }
    idx = maintained_index(spark, work, probe_cells)
    probe = probe_ivfpq(idx, emb, cb_lit)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "codes" in ln
    )
    assert "PartitionFilters:" in scan
    pf = scan.split("PartitionFilters:")[1]
    assert "cell" in pf and pf.strip()[:3] != "[],"

    # and the maintained store answers like the staged one-shot index
    from postfix_log_parser_spark.ext.quantize import q157_ann_incremental

    maintained = {tuple(r) for r in probe.collect()}
    oneshot = {tuple(r) for r in q157_ann_incremental(spark, SF).collect()}
    assert maintained == oneshot


def test_index_takedown_is_cell_scoped_and_idempotent(spark, tmp_path):
    """q177's core against the store directly: retracting a batch
    rewrites ONLY the cells the deleted vectors live in (other cell
    directories are untouched), a drained cell is swept, and re-applying
    the same takedown leaves the store byte-stable in content."""
    from postfix_log_parser_spark.ext.quantize import _cb_lit, _codebook
    from postfix_log_parser_spark.ext.streamann import (
        apply_index_takedown,
        run_index_maintenance,
    )

    emb = _with_norm(_emb(spark, SF))
    cb_lit = _cb_lit(_codebook(emb))
    work = str(tmp_path / "work")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, SF, waves_dir)
    run_index_maintenance(spark, waves_dir, work, cb_lit)
    codes_dir = f"{work}/codes"
    before_rows = {
        (r.vec_id, r.cell)
        for r in spark.read.parquet(codes_dir).collect()
    }

    def snapshot():
        out = {}
        for root, _dirs, files in os.walk(codes_dir):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    # delete the vectors of exactly ONE cell (pick the cell of some
    # indexed vector) — only that cell directory may change
    some = spark.read.parquet(codes_dir).orderBy("vec_id").head()
    victims = [
        r.vec_id
        for r in spark.read.parquet(codes_dir)
        .filter(F.col("cell") == some.cell).limit(3).collect()
    ]
    deleted = emb.filter(F.col("vec_id").isin(victims)).select("vec_id", "v")
    before = snapshot()
    apply_index_takedown(spark, work, deleted)
    after = snapshot()
    changed_cells = {
        p.split("cell=")[1].split("/")[0]
        for p in (set(before) ^ set(after)
                  | {p for p in before if p in after and before[p] != after[p]})
        if "cell=" in p
    }
    assert changed_cells <= {str(some.cell)}, changed_cells
    got = {(r.vec_id, r.cell) for r in spark.read.parquet(codes_dir).collect()}
    assert got == {t for t in before_rows if t[0] not in set(victims)}

    # idempotent: re-apply, content unchanged
    apply_index_takedown(spark, work, deleted)
    again = {(r.vec_id, r.cell) for r in spark.read.parquet(codes_dir).collect()}
    assert again == got
