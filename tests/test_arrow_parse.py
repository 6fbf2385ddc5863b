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


def test_unicode_whitespace_tokenize_parity(spark):
    """Python str.split() treats NBSP/NEL/ideographic space etc. as
    separators; Java regex \\s does not.  The Catalyst tokenizer uses an
    explicit Unicode class (_WS) so both engines agree on lines containing
    such characters (the seeded ASCII fuzz can never catch this)."""
    base = "2024-04-09T20:22:42.548478+03:00 localhost postfix/x[1]: AAAAAAAAAAA:"
    lines = [
        f"{base} from=<a@b.c>,\xa0size=1",          # NBSP between tokens
        f"{base} status=sent　(250 2.0.0 ok)",  # ideographic space
        f"{base} to=<x@y.z>",                  # thin space
        f"\xa0{base} removed\x85",                  # NBSP lead / NEL trail
        f"{base} k=v\x1dW",                         # group separator
    ]
    cat = _rows(parse_lines(lines_df(spark, lines)))
    arr = _rows(parse_lines_arrow(lines_df(spark, lines)))
    assert len(cat) == len(arr) == len(lines)
    for c, a in zip(cat, arr):
        assert c == a, f"unicode ws diverges at seq {c['seq']}:\n cat={c}\n arr={a}"
    # and the tokenization actually split on the exotic whitespace:
    assert cat[0]["fields"] == {"from": "<a@b.c>", "size": "1"}
