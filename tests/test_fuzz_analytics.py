"""Seeded differential fuzz for the r6 analytics/curation operators.

The driver contract compares Spark vs DuckDB on the FIXED testdata; this
suite replays the same comparison on randomized small tables engineered
to hit what the fixed data cannot: duplicate timestamps within and
across users (q61's (ts, event_id) tie-break), funnel events landing
EXACTLY on a prior stage's timestamp (q66's strict ``>``), multi-day
cohorts (q67), zero/short texts and duplicate weights (q62/q64/q65).

Comparison protocol mirrors ``tools/check_contract.py``: row count,
sorted column names, order-insensitive values with floats at 9
significant digits.
"""

import datetime
import math
import random

import duckdb
import pytest

import __spark_entry__ as entry

FUZZED = [
    # r6 analytics
    "q61_scd2_user_state",
    "q66_funnel",
    "q67_retention_cohorts",
    "q62_weighted_sample",
    "q64_table_profile",
    "q65_ols_tokens_vs_chars",
    # dedup family (random corpora rarely near-dup — both engines must
    # agree on exactly WHICH pairs survive, including none)
    "q20_dedup_exact",
    "q21_dedup_ngram_jaccard",
    "q22_dedup_minhash_lsh",
    "q23_dedup_simhash",
    "q69_incremental_dedup",
    "q37_training_mix",
    "q74_passage_dedup",
    # r6-continuation additions over the fuzz tables
    "q70_gapfill_hourly",
    "q71_heavy_hitters_cms",
    "q94_hll_sketch_table",
    "q73_pagerank_transitions",
    "q78_jsonl_roundtrip",
    "q79_csv_roundtrip",
    "q99_orc_roundtrip",
    "q101_variant_shred",
    "q102_xml_roundtrip",
    "q75_rolling_7d",
    "q77_value_histogram",
    "q86_zscore_anomalies",
    "q104_recursive_reachability",
    "q105_ranking_windows",
    "q96_user_features",
    "q97_skew_salted_join",
    "q87_grouped_median_mad",
    "q89_cooccurrence_lift",
    # r6-continuation batch 2: random transition graphs hit median-weight
    # ties (q106); the tiny fuzz vocabulary makes heavy shingle overlap,
    # stressing q107's prefix-filter exactness vs the brute-force oracle;
    # duplicate values hit q108's rank-interpolation edges
    "q106_triangle_counts",
    "q107_dedup_prefix_join",
    "q108_winsorized_stats",
    "q109_hierarchical_rollup",
    # streaming shapes vs their batch oracles on randomized events
    "q88_stream_interval_join",
    "q90_stream_interval_join_outer",
    "q98_stream_interval_join_full",
    "q95_stream_dedup_within_watermark",
    # corpus export / tokenizer family (zero-word docs hit the chunking
    # and entropy edges the fixed corpus cannot)
    "q80_shard_export",
    "q81_range_export",
    "q82_bpe_pair_counts",
    "q83_train_split",
    "q84_context_chunks",
    "q103_udtf_segments",
    "q85_source_diversity",
    # text family
    "q27_text_quality",
    "q28_lang_id",
    "q29_token_stats",
    "q30_fingerprint",
    "q46_repetition_quality",
    "q47_decontamination",
    "q63_bigram_lm_quality",
    # vector family (random embeddings)
    "q25_ann_bruteforce",
    "q26_ann_lsh",
    "q33_ann_ivf",
    "q58_kmeans",
    "q59_ann_pq",
    "q60_int8_quant",
    "q68_ann_ivfpq",
    "q157_ann_incremental",
    "q159_ann_recall",
    # r7 batch: the tiny fuzz vocabulary makes cross-doc 40-char spans
    # ubiquitous (q119/q125/q128 island merges under heavy overlap),
    # integer score TIES exercise q120/q122/q123's tie-breaks, the
    # ts-collision events stress q130/q131's (ts, event_id) ordering,
    # and empty-text docs hit the media-synth edges (q111/q116)
    "q110_bm25_topk",
    "q111_phash_dedup",
    "q112_source_mix",
    "q114_semantic_blocked_neardup",
    "q115_hybrid_rrf",
    "q116_audio_features",
    "q117_stratified_eval_set",
    "q118_contamination_matrix",
    "q119_substring_dedup",
    "q120_cluster_survivors",
    "q121_corpus_diff",
    "q122_nb_source_classifier",
    "q123_quality_calibration",
    "q125_winnowed_spans",
    "q158_strided_spans",
    "q126_observed_export",
    "q127_dataset_card",
    "q128_boilerplate_topk",
    "q129_drift_psi",
    "q130_session_patterns",
    "q131_touch_attribution",
    "q132_lsh_recall",
    # r7 batch 2: colliding (ts, event_id) hit q137's max_by tie-break
    # and q133's QI classes; the tiny vocabulary makes excerpt shingles
    # collide across parents (q134) and shrinks the KMV universe below
    # and above K across seeds (q136); q135's bit paths see dense cells
    "q133_kanonymity",
    "q134_containment_dedup",
    "q135_zorder_layout",
    "q136_kmv_overlap",
    "q137_cdc_snapshot",
    # duplicate values across users hit the phase-1 trim's tie-break
    "q138_topk_per_key",
    # 4-label random embeddings: small cohorts + near-boundary z values
    "q139_embedding_outliers",
    # zero/short texts give 2-frame videos and minimum-width hashes
    "q140_video_scene_cuts",
    # r9: lossy JPEG roundtrip bounds must hold on random doc_id/n_chars
    "q163_jpeg_roundtrip",
    # r9: banded-Hamming recall guarantee must hold on random corpora
    # (the oracle is brute-force all-pairs — any missed pair goes red)
    "q164_simhash_banded_neardup",
    # r9: bloom no-false-negative guarantee on random corpora (exact
    # ground truth recomputed in the same query)
    "q165_bloom_decontamination",
    # r7 batch 3: empty texts hit q141's NULL-metric guards (r1 owns the
    # drop), the 13-word fuzz vocabulary is SMALLER than q144's top-V so
    # OOV must be exactly zero, q143's markers ride on random doc_ids,
    # and q142/q145 re-derive the hash-seeded matrices on random inputs
    "q141_filter_cascade",
    "q142_random_projection",
    "q143_unicode_normalize",
    "q144_vocab_oov",
    "q145_dp_release",
    # composition: empty/dup-heavy fuzz docs collapse whole hash groups
    "q146_curation_pipeline",
    # learned-merge tokenizer: the tiny vocabulary converges in <8 merges
    # across seeds; roundtrip/bounds invariants must hold regardless
    "q148_bpe_tokenize",
    # parity snapshots of random docs: near-boundary D vs critical value
    "q149_ks_drift",
    # streaming curation: emitted hash set must equal the batch DISTINCT
    "q150_stream_curation",
    # DPP join over the rewritten partitioned fact on random events
    "q152_dpp_prune",
    # random corpora rarely near-dup: the audit must agree even when the
    # component map is empty (0 components, NULL rate)
    "q154_split_leakage",
    "q160_component_split",
    # odd total tokens hit the floor()-budget boundary; ties in
    # n_distinct exercise the (quality, source) rank tie-break
    "q156_token_budget",
]

_TYPES = ["view", "click", "purchase", "signup", "error"]
_WORDS = "the quick brown fox jumps over a lazy dog and runs far away".split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _gen_tables(spark, rng, out_dir):
    base = datetime.datetime(2024, 3, 1)
    # events: heavy timestamp collisions, incl. duplicate (user, ts) pairs
    ts_pool = [
        base + datetime.timedelta(minutes=rng.randrange(0, 60 * 24 * 4))
        for _ in range(40)
    ]
    ev = []
    for eid in range(250):
        user = rng.randrange(0, 18)
        ts = rng.choice(ts_pool)
        ev.append(
            (
                eid,
                ts,
                user,
                rng.choice(_TYPES),
                round(rng.uniform(0, 50), 2),
                '{"k": %d}' % rng.randrange(100),
            )
        )
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = []
    for did in range(60):
        n_words = rng.choice([0, 1, 2, 5, 30, 80])
        text = " ".join(rng.choice(_WORDS) for _ in range(n_words))
        docs.append(
            (
                did,
                text,
                rng.choice(["en", "de"]),
                rng.choice(["web", "news", "wiki"]),
                len(text),
            )
        )
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # embeddings: 40 vectors, 64 dims, float32 (values exactly
    # representable so float→double casts agree across engines)
    embs = [
        (
            vid,
            [round(rng.uniform(-1, 1), 3) for _ in range(64)],
            rng.randrange(4),
        )
        for vid in range(40)
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


@pytest.mark.parametrize("seed", [7, 23, 51])
@pytest.mark.parametrize("name", FUZZED)
def test_fuzz_differential(spark, tmp_path, name, seed):
    rng = random.Random(seed)
    sf_dir = str(tmp_path / f"fuzz_{seed}")
    _gen_tables(spark, rng, sf_dir)

    got = entry.queries()[name](spark, sf_dir)
    got_rows = got.collect()

    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        # Spark writes a parquet DIRECTORY; glob its part files
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    oracle = con.sql(entry.oracle_sql()[name])
    o_cols = [c.lower() for c in oracle.columns]
    o_rows = oracle.fetchall()

    g_cols = [c.lower() for c in got.columns]
    assert sorted(g_cols) == sorted(o_cols), (name, g_cols, o_cols)
    assert len(got_rows) == len(o_rows), (name, len(got_rows), len(o_rows))
    assert _norm_rows(g_cols, [tuple(r) for r in got_rows]) == _norm_rows(
        o_cols, o_rows
    ), name
