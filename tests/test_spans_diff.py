"""Unit tests for q119 substring-span dedup, q120 survivor selection,
and q121 corpus diff — hand-built corpora with known answers, so the
island merge / argmax / diff logic is pinned independently of the
DuckDB oracle."""

import pytest
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.spans import SPAN_K, duplicated_spans


BOILER = "x" * 25 + "SHARED-BOILERPLATE-SEGMENT-1234567890-ABCDEFGH" + "y" * 25


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_whole_doc_copy_is_one_maximal_span(spark):
    text = "".join(chr(97 + (i * 7) % 26) for i in range(200))
    out = duplicated_spans(_docs(spark, [(1, text), (2, text)])).collect()
    assert len(out) == 2
    for r in out:
        assert r.span_start == 1
        assert r.span_len == 200
        assert r.n_windows == 200 - SPAN_K + 1


def test_spans_embedded_boilerplate_found_at_different_offsets(spark):
    # the shared 96-char segment sits at different positions in each doc;
    # per-doc span_start must reflect the local offset
    a = "A" + "".join(chr(98 + (i * 11) % 24) for i in range(80)) + BOILER
    b = BOILER + "".join(chr(99 + (i * 13) % 23) for i in range(90)) + "Z"
    out = {r.doc_id: r for r in duplicated_spans(_docs(spark, [(1, a), (2, b)])).collect()}
    assert out[1].span_start == len(a) - len(BOILER) + 1
    assert out[2].span_start == 1
    assert out[1].span_len == len(BOILER)
    assert out[2].span_len == len(BOILER)


def test_spans_within_doc_repeat_alone_is_not_reported(spark):
    # a doc repeating its own 60-char block has duplicated grams but only
    # ONE distinct doc -> cross-doc rule excludes it
    block = "".join(chr(97 + (i * 5) % 26) for i in range(60))
    other = "".join(chr(97 + (i * 3) % 26) for i in range(120))
    out = duplicated_spans(_docs(spark, [(1, block + block), (2, other)])).collect()
    assert out == []


def test_spans_short_docs_are_ignored(spark):
    out = duplicated_spans(
        _docs(spark, [(1, "tiny"), (2, "tiny"), (3, None)])
    ).collect()
    assert out == []


def test_q120_survivor_is_highest_score_then_lowest_id(spark):
    from postfix_log_parser_spark.ext import EXT_QUERIES

    rows = EXT_QUERIES["q120_cluster_survivors"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "augmented corpus must yield at least one cluster"
    for r in rows:
        assert r.n_members >= 2  # components only exist for actual pairs
        assert r.n_dropped == r.n_members - 1
        # the suffix-padded copy has 4 more words than its original, so
        # every 2-member (orig, orig+100000) cluster keeps the copy
        if r.n_members == 2 and r.survivor_id >= 100000:
            assert r.component_id == r.survivor_id - 100000


def test_q121_diff_statuses_partition_the_union(spark):
    from postfix_log_parser_spark.ext import EXT_QUERIES

    out = EXT_QUERIES["q121_corpus_diff"](spark, "/root/testdata/sf0.001")
    agg = {
        r.status: r.n
        for r in out.groupBy("status").agg(F.sum("n_docs").alias("n")).collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    n_removed = docs.filter(F.col("doc_id") % 37 == 0).count()
    n_added = docs.filter(F.col("doc_id") % 53 == 0).count()
    n_changed = docs.filter(
        (F.col("doc_id") % 37 != 0) & (F.col("doc_id") % 11 == 0)
    ).count()
    assert agg.get("removed", 0) == n_removed
    assert agg.get("added", 0) == n_added
    assert agg.get("changed", 0) == n_changed
    assert agg.get("unchanged", 0) == n - n_removed - n_changed
    # every v2 revision appends 14 chars; deltas must be non-zero only
    # where the text actually moved
    deltas = {
        r.status: r.d
        for r in out.groupBy("status").agg(F.sum("chars_delta").alias("d")).collect()
    }
    assert deltas.get("unchanged", 0) == 0
    assert deltas.get("changed", 0) == 14 * n_changed
    assert deltas.get("removed", 0) < 0 < deltas.get("added", 0)


def test_winnowed_spans_match_exact_on_long_spans(spark):
    """For duplicated spans >= K + 2W - 1 the two-pass winnowed pipeline
    is guaranteed exact — on corpora where every duplicated span is long
    (full-copy pairs, embedded 96-char boilerplate) its output must equal
    the stride-1 reference row-for-row."""
    from postfix_log_parser_spark.ext.spans import winnowed_spans

    text = "".join(chr(97 + (i * 7) % 26) for i in range(200))
    a = "A" + "".join(chr(98 + (i * 11) % 24) for i in range(80)) + BOILER
    b = BOILER + "".join(chr(99 + (i * 13) % 23) for i in range(90)) + "Z"
    corpus = _docs(spark, [(1, text), (2, text), (3, a), (4, b)])
    exact = sorted(map(tuple, duplicated_spans(corpus).collect()))
    winnowed = sorted(map(tuple, winnowed_spans(corpus).collect()))
    assert winnowed == exact
    assert len(exact) == 4  # both copy-pairs found


def test_winnowed_equals_exact_on_augmented_testdata(spark):
    """The sf0.001 augmented corpus's duplicated spans are full-text
    copies (always >= K + 2W - 1 chars) — the two pipelines must agree."""
    from postfix_log_parser_spark.ext import EXT_QUERIES

    sf = "/root/testdata/sf0.001"
    exact = sorted(map(tuple, EXT_QUERIES["q119_substring_dedup"](spark, sf).collect()))
    winnowed = sorted(map(tuple, EXT_QUERIES["q125_winnowed_spans"](spark, sf).collect()))
    assert winnowed == exact


def test_winnowed_pass1_moves_fraction_of_grams(spark):
    """The point of winnowing: the cross-doc fingerprint exchange carries
    ~2/(W+1) of the gram stream, not all of it."""
    from postfix_log_parser_spark.ext.spans import SPAN_K, WINNOW_W

    text = "".join(chr(97 + (i * 7 + i * i * 3) % 26) for i in range(2000))
    corpus = _docs(spark, [(1, text), (2, text[100:1900])])
    m_total = sum(len(t) - SPAN_K + 1 for t in (text, text[100:1900]))
    # reproduce pass 1's fingerprint count via the same selection exprs
    from pyspark.sql import functions as F

    k = SPAN_K
    hashes = F.transform(
        F.sequence(F.lit(1), F.length("text") - k + 1),
        lambda i: F.md5(F.col("text").substr(i, F.lit(k))),
    )
    keys = F.transform(
        hashes,
        lambda h, i0: F.concat(h, F.lit("|"), F.lpad((i0 + 1).cast("string"), 10, "0")),
    )
    w = WINNOW_W
    win_lo = lambda e: F.greatest(F.lit(1), e - w + 1)  # noqa: E731
    selected = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("text") - k + 1),
            lambda e: F.array_min(F.slice(F.col("_keys"), win_lo(e), e - win_lo(e) + 1)),
        )
    )
    n_sel = (
        corpus.withColumn("_keys", keys)
        .select(F.explode(selected))
        .count()
    )
    assert n_sel < 0.4 * m_total  # ~2/(W+1) ≈ 0.22 expected at W=8


def test_strided_spans_match_exact_on_long_spans(spark):
    """q158's mod-hash "expected stride" selection: on corpora whose
    duplicated spans are long (miss probability (1-1/S)^(L-K+1) ~ 0, and
    md5 makes the draw deterministic), the two-pass strided pipeline
    must equal the stride-1 reference row-for-row."""
    from postfix_log_parser_spark.ext.spans import strided_spans

    text = "".join(chr(97 + (i * 7) % 26) for i in range(200))
    a = "A" + "".join(chr(98 + (i * 11) % 24) for i in range(80)) + BOILER
    b = BOILER + "".join(chr(99 + (i * 13) % 23) for i in range(90)) + "Z"
    corpus = _docs(spark, [(1, text), (2, text), (3, a), (4, b)])
    exact = sorted(map(tuple, duplicated_spans(corpus).collect()))
    strided = sorted(map(tuple, strided_spans(corpus).collect()))
    assert strided == exact
    assert len(exact) == 4


def test_strided_equals_exact_on_augmented_testdata(spark):
    """sf0.001 augmented corpus: q158 == q119 row-for-row (the planted
    duplicated spans are full-text copies, far above the miss bound)."""
    from postfix_log_parser_spark.ext import EXT_QUERIES

    sf = "/root/testdata/sf0.001"
    exact = sorted(
        map(tuple, EXT_QUERIES["q119_substring_dedup"](spark, sf).collect())
    )
    strided = sorted(
        map(tuple, EXT_QUERIES["q158_strided_spans"](spark, sf).collect())
    )
    assert strided == exact and len(exact) > 0


def test_strided_pass1_moves_fraction_of_grams(spark):
    """The point of the knob: the pass-1 cross-doc exchange carries
    ~1/S of the gram stream (content-defined mod-hash selection), not
    all of it."""
    from pyspark.sql import functions as F

    from postfix_log_parser_spark.ext.spans import SPAN_K, STRIDE_S

    text = "".join(chr(97 + (i * 7 + i * i * 3) % 26) for i in range(2000))
    corpus = _docs(spark, [(1, text), (2, text[100:1900])])
    m_total = sum(len(t) - SPAN_K + 1 for t in (text, text[100:1900]))
    k = SPAN_K
    hexes = F.transform(
        F.sequence(F.lit(1), F.length("text") - k + 1),
        lambda i: F.md5(F.col("text").substr(i, F.lit(k))),
    )
    grams = corpus.select(F.explode(hexes).alias("hx"))
    n_sel = grams.filter(
        F.conv(F.substring("hx", 1, 15), 16, 10).cast("long") % STRIDE_S == 0
    ).count()
    frac = n_sel / m_total
    assert 0.5 / STRIDE_S < frac < 2.0 / STRIDE_S
