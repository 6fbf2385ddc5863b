"""Analytics-layer tests that the DuckDB oracle harness cannot express.

The per-query oracle comparison lives in the driver contract
(``tools/check_contract.py``).  This file covers what that harness
structurally can't: q15's approximate sketch has no exact oracle, so its
verification is a tolerance band against the exact twin (q15b, which IS
hash-verified against DuckDB).
"""

from postfix_log_parser_spark.analytics import (
    q15_approx_distinct,
    q15b_exact_distinct,
)

SF_DIR = "/root/testdata/sf0.01"


def test_q15_approx_within_5pct(spark):
    """Every approx_count_distinct estimate is within 5% of the exact
    distinct count, per group and per column.  Spark's HLL++ default rsd
    is 5%, and the sketch is deterministic for a given input, so this is
    a stable bound, not a flaky statistical one."""
    approx = {r["l_returnflag"]: r for r in q15_approx_distinct(spark, SF_DIR).collect()}
    exact = {r["l_returnflag"]: r for r in q15b_exact_distinct(spark, SF_DIR).collect()}
    assert set(approx) == set(exact) and len(exact) >= 3
    for flag, ex in exact.items():
        ap = approx[flag]
        for a_col, e_col in (
            ("approx_parts", "exact_parts"),
            ("approx_orders", "exact_orders"),
        ):
            rel_err = abs(ap[a_col] - ex[e_col]) / ex[e_col]
            assert rel_err <= 0.05, (flag, a_col, ap[a_col], ex[e_col], rel_err)
