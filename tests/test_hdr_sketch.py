"""q168's HDR log-linear quantile sketch: bucket math and mergeability.

The integer bucket formulas are the whole point (no log()/pow(), so
Spark and DuckDB agree bit-for-bit); these tests pin them in pure
Python against first principles, and pin the MERGE property that makes
the sketch a 100 TB operator: sketches built on disjoint shards and
merged by adding counts yield exactly the quantiles of a single-pass
build.
"""

import pyspark.sql.functions as F

from postfix_log_parser_spark.ext.sketches import (
    _HDR_IDX,
    _HDR_REP,
    hdr_quantiles,
    hdr_sketch,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_idx(v: int) -> int:
    if v < 32:
        return v
    b = v.bit_length() - 1
    return (b - 4) * 32 + (v >> (b - 5)) - 32


def _py_rep(i: int) -> int:
    if i < 32:
        return i
    lo = (32 + i % 32) << (i // 32 - 1)
    width = 1 << (i // 32 - 1)
    return lo + (width - 1) // 2


def test_bucket_math_first_principles():
    """idx is monotone non-decreasing, rep lands inside its bucket, and
    the relative error bound |rep - v| <= v/64 holds for every v in a
    dense sweep plus the 64-bit-ish extremes."""
    last = -1
    for v in list(range(1, 200_000)) + [2**40 - 3, 2**40, 2**52 + 12345]:
        i = _py_idx(v)
        assert i >= last or v == 2**40 - 3  # sweep restart at extremes
        if v < 200_000:
            last = i
        assert _py_idx(_py_rep(i)) == i, f"rep leaves its bucket at v={v}"
        assert abs(_py_rep(i) - v) * 64 <= v, f"error bound broken at v={v}"


def test_sql_exprs_match_python(spark):
    """The Catalyst expression strings compute the same idx/rep as the
    reference Python — the formulas the DuckDB oracle also replicates."""
    vs = list(range(1, 5000)) + [2**20 + 7, 2**33 - 1, 2**40 + 11]
    df = spark.createDataFrame([(v,) for v in vs], "v long").withColumn(
        "idx", F.expr(_HDR_IDX.format(v="v"))
    )
    df = df.withColumn("rep", F.expr(_HDR_REP.format(i="idx")))
    rows = df.collect()
    for r in rows:
        assert r.idx == _py_idx(r.v), f"idx mismatch at v={r.v}"
        assert r.rep == _py_rep(r.idx), f"rep mismatch at v={r.v}"


def test_merge_equals_rebuild(spark):
    """Sketches built per shard and merged by summing counts give the
    same quantiles as one global build — the mergeability contract."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    raw = orders.select(
        F.col("o_orderpriority").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        (F.col("o_orderkey") % 2).alias("shard"),
    )
    whole = hdr_sketch(raw, "key", "v")
    parts = [
        hdr_sketch(raw.filter(F.col("shard") == s), "key", "v")
        for s in (0, 1)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .groupBy("key", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    qs = [50, 95, 99]
    a = {
        r.key: r.asDict()
        for r in hdr_quantiles(whole, "key", qs).collect()
    }
    b = {
        r.key: r.asDict()
        for r in hdr_quantiles(merged, "key", qs).collect()
    }
    assert a == b and len(a) == 5
