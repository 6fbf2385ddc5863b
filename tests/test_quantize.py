"""Behavioral invariants for the clustering / quantization extensions
(q58-q60).  Value-level correctness is the DuckDB oracle harness's job;
these pin the algorithmic guarantees the oracle comparison can't see.
"""

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _emb_count(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()


def test_kmeans_partitions_every_vector(spark):
    from postfix_log_parser_spark.ext.cluster import K, q58_kmeans

    rows = q58_kmeans(spark, SF_DIR).collect()
    assert len(rows) <= K
    assert sum(r.n_members for r in rows) == _emb_count(spark)
    assert all(0 <= r.cluster_id < K for r in rows)
    assert all(r.mean_sq_dist >= 0 for r in rows)


def test_kmeans_lloyd_update_does_not_increase_cost(spark):
    """One Lloyd update (assign → recompute means → reassign) must not
    increase total within-cluster squared distance (monotonicity), up to
    the 1e-6 centroid rounding both engines apply."""
    from postfix_log_parser_spark.ext.cluster import K, _assign, _update
    from postfix_log_parser_spark.ext.similarity import _emb

    emb = _emb(spark, SF_DIR)
    init = sorted(
        emb.filter(F.col("vec_id") < K).collect(), key=lambda r: r.vec_id
    )
    cents0 = [list(r.v) for r in init]
    a0 = _assign(emb, cents0)
    cost0 = a0.agg(F.sum("d2")).collect()[0][0]
    cents1 = _update(a0, cents0)
    cost1 = _assign(emb, cents1).agg(F.sum("d2")).collect()[0][0]
    assert cost1 <= cost0 + 1e-3


def test_pq_topk_shape_and_ranking(spark):
    from postfix_log_parser_spark.ext.quantize import PQ_TOP_K, q59_ann_pq

    rows = q59_ann_pq(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        assert r.neighbor_id != r.qid
        by_q.setdefault(r.qid, []).append(r)
    n_queries = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") % 100 == 0)
        .count()
    )
    assert len(by_q) == n_queries
    for got in by_q.values():
        got.sort(key=lambda r: r.rn)
        assert [r.rn for r in got] == list(range(1, PQ_TOP_K + 1))
        # ADC scores are non-increasing in rank
        assert all(
            a.adc_dot >= b.adc_dot for a, b in zip(got, got[1:])
        )


def test_pq_adc_approximates_exact_dot(spark):
    """The ADC score of a returned neighbor must be close to its exact
    dot product — PQ with 16 codewords per 8-dim subspace on this data
    keeps per-subspace quantization error small; a gross mismatch means
    codes and LUT disagree about the codebook."""
    from postfix_log_parser_spark.ext.quantize import q59_ann_pq
    from postfix_log_parser_spark.ext.similarity import _dot, _emb, _with_norm

    top = q59_ann_pq(spark, SF_DIR)
    emb = _with_norm(_emb(spark, SF_DIR))
    q = emb.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    joined = (
        top.join(emb, top.neighbor_id == emb.vec_id)
        .join(q, "qid")
        .withColumn("exact_dot", _dot(F.col("qv"), F.col("v")))
    )
    for r in joined.select("adc_dot", "exact_dot", "qn", "nrm").collect():
        # normalized ADC error vs the exact dot, in cosine units
        err = abs(r.adc_dot - r.exact_dot) / (r.qn * r.nrm)
        assert err < 0.35, f"ADC diverges from exact dot: {r}"


def test_int8_quant_error_bounded_by_half_step(spark):
    """Uniform quantization's reconstruction error is at most half a
    quantization step per dimension."""
    from postfix_log_parser_spark.ext.quantize import q60_int8_quant

    rows = q60_int8_quant(spark, SF_DIR).collect()
    assert len(rows) == 64
    for r in rows:
        step = (r.qmax - r.qmin) / 255.0
        # qmin/qmax/max_abs_err are each rounded to 1e-6 in-query
        assert r.max_abs_err <= step / 2 + 2e-6, r
        assert 0 <= r.avg_abs_err <= r.max_abs_err + 1e-9


def test_ivfpq_candidates_subset_of_probed_cells(spark):
    """Every IVF-PQ neighbor must live in one of its query's two probed
    cells, and ranks must be dense from 1."""
    from pyspark.sql import functions as F

    from postfix_log_parser_spark.ext.quantize import PQ_TOP_K, q68_ann_ivfpq
    from postfix_log_parser_spark.ext.similarity import _cell_scores, _emb

    rows = q68_ann_ivfpq(spark, SF_DIR).collect()
    emb = _emb(spark, SF_DIR).withColumn("cs", _cell_scores(F.col("v")))
    cell = (F.array_position(F.col("cs"), F.array_max("cs")) - 1).cast("int")
    cells = {r.vec_id: r.cell for r in emb.withColumn("cell", cell).select("vec_id", "cell").collect()}
    by_q = {}
    for r in rows:
        assert r.neighbor_id != r.qid
        by_q.setdefault(r.qid, []).append(r)
    for qid, got in by_q.items():
        got.sort(key=lambda r: r.rn)
        assert [r.rn for r in got] == list(range(1, len(got) + 1))
        assert len(got) <= PQ_TOP_K
        probed_ok = {cells[r.neighbor_id] for r in got}
        assert len(probed_ok) <= 2  # at most the two probed cells
