"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], plus parse→sessionize throughput on a
synthetic postfix log scaled to the testdata size.

Prints ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "parse_lines_per_sec": N}

Queries are materialized with a noop write (full execution, no driver
collect).  Synthetic log: interleaved sessions built from the golden
fixture patterns (FIXTURES.md), ~5 lines/session.

Repeatability: each query runs $SPARK_GRAFT_BENCH_REPEAT times (or
``--repeat N``; default 3) in one process and reports the per-query
MEDIAN — the shared host's ~2x timing weather averages out, so
round-over-round deltas reflect code, not load.  ``value`` is the sum of
medians; if ANY query errored, ``value`` is null (a failed round must
never compare better than a complete one) with per-query details under
``errors``.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postfix_log_parser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: every driver query family, ordered cheap->expensive
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_customers",
    "q04_order_priority",
    "q05_segment_rollup",
    "q06_returnflag_cube",
    "q07_top3_per_nation",
    "q08_running_total",
    "q09_event_deltas",
    "q10_event_sessions",
    "q11_hourly_events",
    "q12_customers_without_orders",
    "q13_nation_setops",
    "q14_brand_strings",
    "q15_approx_distinct",
    "q15b_exact_distinct",
    "q16_json_props",
    "q17_asof_signup",
    "q18_range_join",
    "q66_funnel",
    "q67_retention_cohorts",
    "q19_skew_salted",
    "q96_user_features",
    "q97_skew_salted_join",
    "q20_dedup_exact",
    "q21_dedup_ngram_jaccard",
    "q22_dedup_minhash_lsh",
    "q107_dedup_prefix_join",
    "q23_dedup_simhash",
    "q164_simhash_banded_neardup",
    "q24_embed_neardup",
    "q36_dedup_components",
    "q69_incremental_dedup",
    "q37_training_mix",
    "q25_ann_bruteforce",
    "q26_ann_lsh",
    "q33_ann_ivf",
    "q27_text_quality",
    "q28_lang_id",
    "q29_token_stats",
    "q30_fingerprint",
    "q31_multimodal_features",
    "q32_tfidf",
    "q46_repetition_quality",
    "q47_decontamination",
    "q63_bigram_lm_quality",
    "q64_table_profile",
    "q65_ols_tokens_vs_chars",
    "q52_pack_sequences",
    "q53_approx_quantiles",
    "q61_scd2_user_state",
    "q62_weighted_sample",
    "q58_kmeans",
    "q59_ann_pq",
    "q60_int8_quant",
    "q68_ann_ivfpq",
    "q157_ann_incremental",
    "q159_ann_recall",
    "q34_frame_sample",
    "q35_grouping_sets",
    "q70_gapfill_hourly",
    "q80_shard_export",
    "q81_range_export",
    "q82_bpe_pair_counts",
    "q83_train_split",
    "q84_context_chunks",
    "q85_source_diversity",
    "q86_zscore_anomalies",
    "q87_grouped_median_mad",
    "q108_winsorized_stats",
    "q109_hierarchical_rollup",
    "q89_cooccurrence_lift",
    "q91_correlated_scalar",
    "q92_not_exists",
    "q93_lateral_topn",
    "q71_heavy_hitters_cms",
    "q94_hll_sketch_table",
    "q165_bloom_decontamination",
    "q72_bloom_semijoin",
    "q73_pagerank_transitions",
    "q106_triangle_counts",
    "q74_passage_dedup",
    "q75_rolling_7d",
    "q76_entity_resolution",
    "q77_value_histogram",
    "q78_jsonl_roundtrip",
    "q79_csv_roundtrip",
    "q99_orc_roundtrip",
    "q100_bucketed_join",
    "q101_variant_shred",
    "q104_recursive_reachability",
    "q105_ranking_windows",
    "q102_xml_roundtrip",
    "q103_udtf_segments",
    "q55_pivot_segments",
    "q56_unpivot_metrics",
    # r7 additions: retrieval, decoded-media, mixing/eval construction,
    # span dedup (exact + winnowed), survivors, diff, classifier,
    # calibration, dataset card, Observation export, Python DataSource
    "q110_bm25_topk",
    "q115_hybrid_rrf",
    "q111_phash_dedup",
    "q116_audio_features",
    "q112_source_mix",
    "q117_stratified_eval_set",
    "q118_contamination_matrix",
    "q119_substring_dedup",
    "q125_winnowed_spans",
    "q158_strided_spans",
    "q128_boilerplate_topk",
    "q114_semantic_blocked_neardup",
    "q120_cluster_survivors",
    "q121_corpus_diff",
    "q122_nb_source_classifier",
    "q123_quality_calibration",
    "q127_dataset_card",
    "q126_observed_export",
    "q129_drift_psi",
    "q130_session_patterns",
    "q131_touch_attribution",
    "q132_lsh_recall",
    "q133_kanonymity",
    "q134_containment_dedup",
    "q135_zorder_layout",
    "q136_kmv_overlap",
    "q137_cdc_snapshot",
    "q138_topk_per_key",
    "q139_embedding_outliers",
    "q140_video_scene_cuts",
    "q163_jpeg_roundtrip",
    "q141_filter_cascade",
    "q142_random_projection",
    "q143_unicode_normalize",
    "q144_vocab_oov",
    "q145_dp_release",
    "q146_curation_pipeline",
    "q147_skew_audit",
    "q148_bpe_tokenize",
    "q149_ks_drift",
    "q150_stream_curation",
    "q151_metadata_stats",
    "q152_dpp_prune",
    "q153_pysink_roundtrip",
    "q161_pystream_source",
    "q162_pystream_sessions",
    "q166_pystream_relay",
    "q167_adpcm_features",
    "q168_hdr_quantiles",
    "q169_stream_hdr_quantiles",
    "q170_passjoin_editdist",
    "q171_dialog_assembly",
    "q172_incremental_components",
    "q173_stream_components",
    "q174_components_with_deletes",
    "q175_stream_components_with_deletes",
    "q176_stream_ann_index",
    "q177_stream_ann_deletes",
    "q178_events_takedown",
    "q179_rollup_delete_propagation",
    "q180_stream_bm25_index",
    "q181_bm25_index_takedown",
    "q182_bm25_layout_migration",
    "q154_split_leakage",
    "q160_component_split",
    "q155_aqe_skew_join",
    "q156_token_budget",
    "q124_pysource_events",
    "q40_log_events",
    "q45_fused_events",
    "q48_pii_mask",
    "q41_log_faults",
    "q42_log_state",
    "q43_stream_events",
    "q49_stream_hourly",
    "q50_stream_enrich",
    "q51_stream_dedup",
    "q95_stream_dedup_within_watermark",
    "q54_stream_sessions",
    "q57_stream_rollup_mv",
    "q88_stream_interval_join",
    "q90_stream_interval_join_outer",
    "q98_stream_interval_join_full",
    "q44_sink_roundtrip",
]


def synth_log_lines(n_sessions: int) -> list[str]:
    """Deterministic synthetic postfix log: interleaved 5-line sessions in
    the golden-fixture shape (client / message-id / from / to / removed),
    with a sprinkle of noise and dovecot lines."""
    lines: list[str] = []
    base_us = 0
    for i in range(n_sessions):
        qid = f"{i:011X}"[-11:]
        # keep it uppercase hex, 11 chars
        qid = format(i % (16**11), "011X")
        t = lambda k: (  # noqa: E731
            f"2024-04-09T20:{(base_us // 60000000) % 40 + 10:02d}:"
            f"{(base_us // 1000000) % 60:02d}."
            f"{base_us % 1000000:06d}+03:00"
        )
        u = i % 97
        lines.append(
            f"{t(0)} localhost postfix/smtpd[100]: {qid}: "
            f"client=host{u}.example.com[10.0.0.{u % 250}], sasl_method=PLAIN"
        )
        lines.append(
            f"{t(1)} localhost postfix/cleanup[101]: {qid}: "
            f"message-id=<msg-{i}@example.com>"
        )
        lines.append(
            f"{t(2)} localhost postfix/qmgr[102]: {qid}: "
            f"from=<sender{u}@domain{u % 13}.com>, size={900 + u}, nrcpt=1 (queue active)"
        )
        if i % 17 == 0:
            lines.append(
                f"{t(3)} localhost postfix/smtpd[100]: disconnect from "
                f"host{u}.example.com[10.0.0.{u % 250}] commands=8"
            )
        lines.append(
            f"{t(4)} localhost postfix/lmtp[103]: {qid}: "
            f"to=<rcpt{u}@dest{u % 7}.org>, relay=mail.localhost[private/dovecot-lmtp], "
            f"delay=0.5, delays=0.2/0.1/0.1/0.1, dsn=2.0.0, status=sent "
            f"(250 2.0.0 <rcpt{u}@dest{u % 7}.org> ok Saved)"
        )
        if i % 29 == 0:
            lines.append(
                "Apr 30 15:09:27 lmtp(x)<1><y>: Info: sieve: "
                f"msgid=<msg-{i}@example.com>: fileinto action: stored mail into mailbox 'Inbox'"
            )
        lines.append(f"{t(5)} localhost postfix/qmgr[102]: {qid}: removed")
        base_us += 1_000_037
    return lines


def main() -> None:
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    repeat = max(1, repeat)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # warm up the JVM / executor pool
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from postfix_log_parser_spark.ext.staging import clear_result_stages

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        runs: list[float] = []
        for _ in range(repeat):
            # result-staged queries (pystream trio, q43, fixture folds)
            # must time a REAL execution every repeat, not a StageCache
            # read — the bench median is a cost statement (r13; no-op
            # for queries with no registered result stage)
            clear_result_stages(name)
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            except Exception as exc:  # one broken query must not zero the round
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"[bench] {name} FAILED: {errors[name]}", file=sys.stderr)
                break
        if runs:
            timings[name] = round(statistics.median(runs), 3)

    # parse→sessionize throughput on a synthetic log scaled with sf
    n_sessions = max(2000, int(200_000 * sf))
    log_lines = synth_log_lines(n_sessions)
    tmp = tempfile.mkdtemp(prefix="bench_log_")
    try:
        path = os.path.join(tmp, "mail.log")
        with open(path, "w") as fh:
            fh.write("\n".join(log_lines))
        from postfix_log_parser_spark.operators.parse import parse_lines_arrow
        from postfix_log_parser_spark.operators.sessionize import sessionize
        from postfix_log_parser_spark.sources.text import read_text

        lines_per_sec = None
        parse_runs: list[float] = []
        for _ in range(repeat):
            t0 = time.time()
            try:
                raw = read_text(spark, path)
                events, faults, state = sessionize(
                    parse_lines_arrow(raw), raw_lines=raw
                )
                events.write.format("noop").mode("overwrite").save()
                parse_runs.append(time.time() - t0)
            except Exception as exc:
                errors["parse_sessionize"] = f"{type(exc).__name__}: {exc}"[:500]
                print(
                    f"[bench] parse_sessionize FAILED: {errors['parse_sessionize']}",
                    file=sys.stderr,
                )
                break
        if parse_runs:
            parse_sec = statistics.median(parse_runs)
            timings["parse_sessionize"] = round(parse_sec, 3)
            lines_per_sec = round(len(log_lines) / parse_sec, 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # a round with ANY failed query reports value=null: an incomplete total
    # must never look faster than a complete one (sum would drop the
    # missing queries and read as an improvement)
    total = round(sum(timings.values()), 3) if not errors else None
    result = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "repeat": repeat,
        "parse_lines_per_sec": lines_per_sec,
    }
    if errors:
        result["errors"] = errors
    # Full per-query record first (humans / BENCH_local archives) ...
    print(json.dumps(result))
    # ... then a compact FINAL line for the driver, which captures only the
    # last ~2000 chars of stdout and parses the last JSON line.  r6's single
    # 108-query line exceeded that and BENCH_r06 recorded `parsed: null`.
    compact = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "repeat": repeat,
        "n_queries": len(timings),
        "parse_lines_per_sec": lines_per_sec,
    }
    if errors:
        compact["errors"] = {k: v[:80] for k, v in list(errors.items())[:5]}
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    with_q = dict(compact, queries=slowest)
    line = json.dumps(with_q)
    print(line if len(line) <= 1800 else json.dumps(compact))

    # release every staged checkpoint frame (LSH pairs, components,
    # IVF-PQ index) before the session goes away — the stage-lifecycle
    # teardown contract (ext/staging.py)
    from postfix_log_parser_spark.ext.staging import clear_stages

    clear_stages()


if __name__ == "__main__":
    main()
