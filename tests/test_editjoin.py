"""PassJoin exact edit-distance join (q170) + dialog assembly (q171).

Three layers:

* a hypothesis proof of the PIGEONHOLE blocking property — any pair of
  24-char keys within edit distance 2 shares at least one aligned
  segment within a ±2 window (the zero-false-negative guarantee the
  engine's candidate join relies on), exercised over randomly edited
  strings including the insert/delete shift cases;
* an end-to-end Spark run on a crafted corpus compared against a pure-
  Python brute force using the identical key derivation — exactness at
  the threshold, independent of the DuckDB oracle;
* plan-shape pins: q170 must candidate-generate via an EQUI-join (never
  a cartesian / nested loop), q171's dialog hash must be deterministic
  under timestamp ties (event_id breaks them).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postfix_log_parser_spark.ext.editjoin import (
    KEY_LEN,
    MAX_ED,
    N_SEG,
    SEG_LEN,
    _SEG_STARTS,
    q170_passjoin_editdist,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def _blocked_candidate(a: str, b: str) -> bool:
    """Python mirror of the engine's candidate join: does some aligned
    segment of `a` appear in `b` within a ±MAX_ED shift window?"""
    for p in _SEG_STARTS:
        seg = a[p:p + SEG_LEN]
        lo = max(0, p - MAX_ED)
        hi = min(KEY_LEN - SEG_LEN, p + MAX_ED)
        for start in range(lo, hi + 1):
            if b[start:start + SEG_LEN] == seg:
                return True
    return False


_ALPHA = "ab "


@given(
    s=st.text(alphabet=_ALPHA, min_size=KEY_LEN, max_size=KEY_LEN),
    edits=st.lists(
        st.tuples(
            st.sampled_from(["sub", "ins", "del"]),
            st.integers(min_value=0, max_value=KEY_LEN - 1),
            st.sampled_from(_ALPHA),
        ),
        min_size=0, max_size=MAX_ED,
    ),
)
@settings(max_examples=400, deadline=None)
def test_pigeonhole_blocking_has_no_false_negatives(s, edits):
    t = s
    for op, pos, ch in edits:
        pos = min(pos, max(len(t) - 1, 0))
        if op == "sub" and t:
            t = t[:pos] + ch + t[pos + 1:]
        elif op == "ins":
            t = t[:pos] + ch + t[pos:]
        elif op == "del" and t:
            t = t[:pos] + t[pos + 1:]
    t = (t + " " * KEY_LEN)[:KEY_LEN]  # the engine's rpad/truncate
    if _lev(s, t) <= MAX_ED:
        assert _blocked_candidate(s, t), (s, t)


def test_segment_geometry():
    assert N_SEG == MAX_ED + 1
    assert N_SEG * SEG_LEN == KEY_LEN


def _norm_key(text: str) -> str:
    import re
    k = re.sub(r"\s+", " ", text).lower()[:KEY_LEN]
    return k.ljust(KEY_LEN)


def test_q170_matches_bruteforce_on_crafted_corpus(spark, tmp_path):
    # ids chosen so no doc hits the %20 augmentation (the twins would
    # just add more pairs; excluding them keeps the expectation readable)
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),      # same 24-prefix
        (3, "aXpha beta gamma delta epsilon"),          # 1 sub in-prefix
        (7, "completely different text body here"),
        (9, "alpha  beta gamma delta"),                 # ws-collapse twin
        (11, "zzz unrelated prefix words"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in q170_passjoin_editdist(spark, sf).collect()
    }
    keys = {i: _norm_key(t) for i, t in docs}
    want = {
        (a, b, _lev(keys[a], keys[b]))
        for a in keys for b in keys
        if a < b and _lev(keys[a], keys[b]) <= MAX_ED
    }
    assert want, "crafted corpus must contain in-threshold pairs"
    assert got == want


def test_q170_plan_is_equi_join(spark):
    df = q170_passjoin_editdist(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_q171_dialog_hash_breaks_timestamp_ties_by_event_id(spark, tmp_path):
    import datetime as dt

    from postfix_log_parser_spark.ext.dialogs import q171_dialog_assembly

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # one user, one session, two events with IDENTICAL timestamps:
        # event_id order (5 before 9) must decide the dialog order
        (5, ts, 1, "click", 1.0, "{}"),
        (9, ts, 1, "buy", 2.0, "{}"),
        # second session for the same user, past the 30-min gap
        (12, ts + dt.timedelta(hours=2), 1, "view", 0.5, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = {
        (r.sid, r.n_turns): r.dialog_hash
        for r in q171_dialog_assembly(spark, sf).collect()
    }
    import hashlib
    assert out[(1, 2)] == hashlib.md5(b"click|buy").hexdigest()
    assert out[(2, 1)] == hashlib.md5(b"view").hexdigest()
