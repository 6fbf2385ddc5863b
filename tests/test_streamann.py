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
