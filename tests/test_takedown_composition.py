"""Cross-family takedown composition (r11 verdict #8): one corpus
streamed into ALL THREE maintained-state families — component map (CC),
ANN code store, BM25 inverted index — then the SAME takedown batch
applied to each, asserting every family's post-takedown probe equals
its from-scratch rebuild over the surviving corpus.  Until r12 each
family's takedown was only tested in isolation; this pins that the
shared StateTable machinery + per-family txn disciplines compose under
one coordinated delete (the real GDPR shape: a doc leaves EVERY derived
store at once)."""

import os
import shutil

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
DEL_MOD, DEL_RES = 5, 1  # the one shared delete set: id % 5 == 1


def _write_waves(df, waves_dir, id_col, n_waves=3):
    """Split ``df`` into n single-file parquet waves by id — the local
    twin of each module's _write_wave_files, reused here so the rebuilt
    reference streams the FILTERED corpus through the same loop."""
    os.makedirs(waves_dir, exist_ok=True)
    for w in range(n_waves):
        stage = f"{waves_dir}.stage{w}"
        (
            df.filter(F.col(id_col) % n_waves == w)
            .repartition(1)
            .write.mode("overwrite").parquet(stage)
        )
        part = next(
            n for n in sorted(os.listdir(stage))
            if n.startswith("part-") and n.endswith(".parquet")
        )
        os.replace(f"{stage}/{part}", f"{waves_dir}/wave-{w:02d}.parquet")
        shutil.rmtree(stage)


def test_one_takedown_batch_converges_all_three_families(spark, tmp_path):
    from postfix_log_parser_spark.ext.dedup import _augmented
    from postfix_log_parser_spark.ext.quantize import (
        _cb_lit,
        _codebook,
        _is_new_batch,
        new_batch_queries,
        probe_ivfpq,
    )
    from postfix_log_parser_spark.ext.similarity import _emb, _with_norm
    from postfix_log_parser_spark.ext.streamann import (
        _cb_fingerprint,
        apply_index_takedown,
        maintained_index,
        run_index_maintenance,
    )
    from postfix_log_parser_spark.ext.streambm25 import (
        apply_bm25_takedown,
        probe_bm25,
        run_bm25_maintenance,
    )
    from postfix_log_parser_spark.ext.streamcc import (
        apply_takedown,
        run_maintenance,
    )

    deleted_pred = F.col("doc_id") % DEL_MOD == DEL_RES

    # ---------------- CC: maintained + takedown vs filtered rebuild
    aug = _augmented(spark, SF).select("doc_id", "text")
    cc_work = str(tmp_path / "cc")
    _write_waves(aug, f"{cc_work}/waves", "doc_id")
    run_maintenance(spark, f"{cc_work}/waves", cc_work)
    deleted_docs = aug.filter(deleted_pred).select("doc_id")
    got_map = apply_takedown(spark, cc_work, deleted_docs)

    cc_ref = str(tmp_path / "cc_ref")
    _write_waves(aug.filter(~deleted_pred), f"{cc_ref}/waves", "doc_id")
    want_map = run_maintenance(spark, f"{cc_ref}/waves", cc_ref)
    # banding recall is per-doc-pair deterministic, so pairs among
    # survivors are identical whether the deleted docs ever existed —
    # maintained-then-deleted must equal never-ingested
    assert sorted(map(tuple, got_map.collect())) == sorted(
        map(tuple, want_map.collect())
    )
    assert got_map.count() > 0

    # ---------------- BM25: maintained + takedown vs filtered rebuild
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    bm_work = str(tmp_path / "bm")
    _write_waves(docs, f"{bm_work}/waves", "doc_id")
    run_bm25_maintenance(spark, f"{bm_work}/waves", bm_work)
    apply_bm25_takedown(spark, bm_work, docs.filter(deleted_pred))
    got_bm = [tuple(r) for r in probe_bm25(spark, bm_work).collect()]

    bm_ref = str(tmp_path / "bm_ref")
    _write_waves(docs.filter(~deleted_pred), f"{bm_ref}/waves", "doc_id")
    run_bm25_maintenance(spark, f"{bm_ref}/waves", bm_ref)
    want_bm = [tuple(r) for r in probe_bm25(spark, bm_ref).collect()]
    assert got_bm == want_bm and got_bm

    # ---------------- ANN: maintained + takedown vs filtered rebuild
    emb = _with_norm(_emb(spark, SF))
    cb = _codebook(emb)
    assert cb[0], "sf0.001 embeddings must yield a codebook"
    cb_lit, cb_fp = _cb_lit(cb), _cb_fingerprint(cb)
    corpus = emb.filter(~_is_new_batch(F.col("vec_id"))).select("vec_id", "v")
    ann_del = F.col("vec_id") % DEL_MOD == DEL_RES

    ann_work = str(tmp_path / "ann")
    _write_waves(corpus, f"{ann_work}/waves", "vec_id")
    run_index_maintenance(spark, f"{ann_work}/waves", ann_work, cb_lit, cb_fp)
    apply_index_takedown(spark, ann_work, corpus.filter(ann_del))

    ann_ref = str(tmp_path / "ann_ref")
    _write_waves(corpus.filter(~ann_del), f"{ann_ref}/waves", "vec_id")
    run_index_maintenance(spark, f"{ann_ref}/waves", ann_ref, cb_lit, cb_fp)

    cells = {
        r.probe_cell
        for r in new_batch_queries(emb, cb_lit)
        .select("probe_cell").distinct().collect()
    }
    got_ann = sorted(
        tuple(r)
        for r in probe_ivfpq(
            maintained_index(spark, ann_work, cells, cb_fp), emb, cb_lit
        ).collect()
    )
    want_ann = sorted(
        tuple(r)
        for r in probe_ivfpq(
            maintained_index(spark, ann_ref, cells, cb_fp), emb, cb_lit
        ).collect()
    )
    assert got_ann == want_ann and got_ann
