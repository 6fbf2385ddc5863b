"""Differential tests: the Arrow parse engine must agree row-for-row with
the Catalyst engine, and the raw-text dovecot dim with the parsed one."""

from pyspark.sql import functions as F

from postfix_log_parser_spark import parse_lines, sessionize
from postfix_log_parser_spark.operators.parse import (
    dovecot_dim_from_raw,
    parse_lines_arrow,
)
from postfix_log_parser_spark.logquery import ALL_EVENTS_FIXTURE, CLEANUP, FAULTS
from postfix_log_parser_spark.sources.text import lines_df
from tests.test_quirks import _line

EDGES = f"""
{_line(0, 1, 'AAAAAAAAAAA: from=<first@a.com>, from=<second@b.com>, size=1')}
{_line(0, 2, 'AAAAAAAAAAA: a=b=c, =leading, trailing=,,,')}
{_line(0, 3, 'AAAAAAAAAAA: status=deferred conversation timed out')}
{_line(0, 4, 'AAAAAAAAAAA: warning: header Subject: hello world trailing')}
{_line(0, 5, 'AAAAAAAAAAA: warning: header Subject: =?UTF-8?B?garbage!!?= from x;')}
{_line(0, 6, 'aaaaaaaaaaa: lowercase rejected')}
{_line(0, 7, 'AAAAAAAAAAA: removed')}
short line
2024 two tokens here now yes
{_line(0, 8, 'BBBBBBBBBBB: warning: header')}
{_line(0, 9, 'x Info:')}
"""

FIXTURE = "\n".join([ALL_EVENTS_FIXTURE, FAULTS, CLEANUP.replace("LINE", ""), EDGES])


def _rows(df):
    return sorted(
        (r.asDict(recursive=True) for r in df.collect()), key=lambda d: d["seq"]
    )


def test_arrow_parse_matches_catalyst(spark):
    lines = [ln for ln in FIXTURE.splitlines() if ln.strip()]
    df = lines_df(spark, lines)
    cat = _rows(parse_lines(df))
    arr = _rows(parse_lines_arrow(lines_df(spark, lines)))
    assert len(cat) == len(arr)
    for c, a in zip(cat, arr):
        assert c == a, f"parse diverges at seq {c['seq']}:\n cat={c}\n arr={a}"


def test_dovecot_dim_from_raw_matches_parsed(spark):
    lines = [ln for ln in FIXTURE.splitlines() if ln.strip()]
    df = lines_df(spark, lines)
    parsed_dim = sorted(
        (r["seq"], r["dovecot_msgid"], r["dovecot_action"])
        for r in parse_lines(df)
        .filter(F.col("dovecot_msgid").isNotNull())
        .collect()
    )
    raw_dim = sorted(
        (r["seq"], r["dovecot_msgid"], r["dovecot_action"])
        for r in dovecot_dim_from_raw(lines_df(spark, lines)).collect()
    )
    assert parsed_dim == raw_dim and len(raw_dim) > 0


def test_sessionize_arrow_fast_path(spark):
    lines = [ln for ln in FIXTURE.splitlines() if ln.strip()]
    raw = lines_df(spark, lines)
    ev_a, fa_a, st_a = sessionize(parse_lines_arrow(raw), raw_lines=raw)
    ev_c, fa_c, st_c = sessionize(parse_lines(raw))
    key = lambda d: (d["queue_id"], d["timestamp"])  # noqa: E731
    ea = sorted((r.asDict(recursive=True) for r in ev_a.collect()), key=key)
    ec = sorted((r.asDict(recursive=True) for r in ev_c.collect()), key=key)
    assert ea == ec
    fa = sorted((r["fault_reason"], r["line"]) for r in fa_a.collect())
    fc = sorted((r["fault_reason"], r["line"]) for r in fa_c.collect())
    assert fa == fc
