"""Empty-input totality: every contract query must run against EMPTY
tables and return an empty (or summary) result — never throw.  At 100 TB
a pipeline routinely sees empty partitions, empty days, and empty
sources; a query surface that crashes on zero rows is not deployable.

Queries whose bounded model-collect is data-dependent (k-means init, PQ
codebook, bigram-LM reference slice, q57's foreachBatch-created table)
must degrade to an empty frame with their normal schema.
"""

import pytest

import __spark_entry__ as entry
from postfix_log_parser_spark.analytics import TABLES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(tmp / f"{t}.parquet"))
    return str(tmp)


# aggregate-without-groupBy queries legitimately return one summary row
# on empty input (SQL semantics: global aggregates always emit)
_GLOBAL_AGG = {
    "q64_table_profile",
    "q66_funnel",
    "q15_approx_distinct",
    # layout-invariant summary: one row (total_docs=0, vacuous bounds)
    "q81_range_export",
    # sketch-table summary: one row (n_days=0, exact=0, null bound)
    "q94_hll_sketch_table",
    # recursion seed: 'signup' is reachable at depth 0 from an empty graph
    "q104_recursive_reachability",
    # export audit: always one metrics row (n_rows=0, NULL aggregates)
    "q126_observed_export",
    # drift report: always the 10 fixed buckets (smoothed PSI ~ 0)
    "q129_drift_psi",
    # recall audit: always one summary row (all counts 0, NULL recall)
    "q132_lsh_recall",
    # ANN recall audit: same shape — one global-aggregate summary row
    "q159_ann_recall",
    # attrition report: always the 5 fixed cascade rows (all counts 0)
    "q141_filter_cascade",
    # skew audit: always one summary row per audited key (4 branches)
    "q147_skew_audit",
    # KS verdict: one global-aggregate row (NULL stats on empty input)
    "q149_ks_drift",
    # footer probes: one row per probed table (n_rows=0, NULL envelopes)
    "q151_metadata_stats",
    # leakage audit: one global summary row (0 components, NULL rate)
    "q154_split_leakage",
}

# the parse-pipeline queries run on the EMBEDDED golden log fixtures
# (their oracle is literal VALUES), not the sf tables — non-empty by
# design; here we only require they still execute with the empty dir
_FIXTURE_INPUT = {
    "q40_log_events",
    "q41_log_faults",
    "q42_log_state",
    "q43_stream_events",
    "q44_sink_roundtrip",
    "q45_fused_events",
    "q48_pii_mask",
    "q124_pysource_events",  # golden fixture through the maillog source
    "q153_pysink_roundtrip",  # fixture through the maillog writer+reader
    "q161_pystream_source",  # fixture through the maillog STREAM reader
    "q162_pystream_sessions",  # fixture stream through the full fold
    "q166_pystream_relay",  # fixture stream relayed through the maillog sink
    "q178_events_takedown",  # fixture events through the sink + GDPR delete
    "q179_rollup_delete_propagation",  # fixture events + rollup MV refresh
}


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_is_total_on_empty_tables(spark, empty_sf_dir, name):
    fn = entry.queries()[name]
    out = fn(spark, empty_sf_dir)
    n = out.count()
    assert out.columns  # schema survives
    if name not in _GLOBAL_AGG and name not in _FIXTURE_INPUT:
        assert n == 0, f"{name} fabricated {n} rows from empty input"
