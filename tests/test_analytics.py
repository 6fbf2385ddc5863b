"""Analytics-layer tests beyond the DuckDB oracle harness.

The per-query oracle comparison lives in the driver contract
(``tools/check_contract.py``).  q15 is now SELF-verifying there too (its
oracle asserts the within-bound booleans are TRUE); this file keeps the
direct numeric band check against the exact twin as a second witness.
"""

from postfix_log_parser_spark.analytics import (
    q15_approx_distinct,
    q15b_exact_distinct,
)

SF_DIR = "/root/testdata/sf0.01"


def test_q15_approx_within_5pct(spark):
    """q15's within-bound booleans are all TRUE, and its exact columns
    equal the sketch-free twin's (q15b).  Spark's HLL++ sketch is
    deterministic for a given input, so this is a stable bound, not a
    flaky statistical one."""
    approx = {r["l_returnflag"]: r for r in q15_approx_distinct(spark, SF_DIR).collect()}
    exact = {r["l_returnflag"]: r for r in q15b_exact_distinct(spark, SF_DIR).collect()}
    assert set(approx) == set(exact) and len(exact) >= 3
    for flag, ex in exact.items():
        ap = approx[flag]
        assert ap["parts_within_bound"] is True, (flag, ap)
        assert ap["orders_within_bound"] is True, (flag, ap)
        assert ap["exact_parts"] == ex["exact_parts"]
        assert ap["exact_orders"] == ex["exact_orders"]
