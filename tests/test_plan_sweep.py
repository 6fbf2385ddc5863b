"""Global plan-shape sweep: NO contract query may plan a
CartesianProduct, and BroadcastNestedLoopJoin is allowed only where the
broadcast side is provably bounded (a 1-row global aggregate, a fixed
constant dimension, or a top-k/limit result) — the cases below, each
with the bound that makes it safe at 100 TB.

The per-query pins in test_plans.py check the shapes specific queries
PROMISE; this sweep checks the invariant every query must hold, so a
new or refactored query that accidentally degenerates into an unbounded
nested loop fails CI even before anyone writes its dedicated pin.

Streaming queries execute their (bounded, fixture-fed) pipelines during
construction; the sweep inspects the returned sink/batch plan — their
stream-time shapes are pinned in test_streaming.py instead.
"""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# name -> why the nested-loop's broadcast side is bounded
BNLJ_BOUNDED = {
    "q18_range_join": "broadcast small dim with range predicate — classic broadcast range join",
    "q23_dedup_simhash": "bounded doc_id<200 slice joined on hamming<=k — documented demo bound",
    "q24_embed_neardup": "tiled cogroup probe bound; guarded by MAX_EXACT_COSINE_ROWS",
    "q25_ann_bruteforce": "tiny fixed query set broadcast against the scan",
    "q159_ann_recall": "inherits q25's bounded query-set broadcast (the exact arm)",
    "q59_ann_pq": "K*DIM codebook LUT broadcast (constant size)",
    "q71_heavy_hitters_cms": "1-row global-N aggregate broadcast for the error bound",
    "q89_cooccurrence_lift": "1-row global basket-count broadcast for the lift denominator",
    "q94_hll_sketch_table": "1-row union-merged range estimate broadcast",
    "q106_triangle_counts": "1-row median-edge-weight broadcast filter",
    "q110_bm25_topk": "1-row corpus stats (N, avgdl) broadcast into the scorer",
    "q112_source_mix": "1-row global weight-sum broadcast for temperature renorm",
    "q115_hybrid_rrf": "two bounded top-50 arms fused; both sides limit-bounded",
    "q117_stratified_eval_set": "1-row total broadcast for largest-remainder apportionment",
    "q122_nb_source_classifier": "class-constant table (|classes| rows) broadcast",
    "q136_kmv_overlap": "n_sources*K sketch rows; pair stage joins sketches only",
    "q147_skew_audit": "1-row summary x 1-row hot-key frames joined per branch",
}


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_no_unbounded_nested_loops(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_BOUNDED, (
            f"{name} plans a BroadcastNestedLoopJoin with no documented "
            "bound — add it to BNLJ_BOUNDED only with a real size bound"
        )
