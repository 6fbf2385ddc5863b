"""Adversarial-text tolerance: the text/dedup/similarity surface must
survive documents a real crawl produces — empty strings, whitespace- and
control-only content, astral-plane emoji (UTF-16 surrogate pairs JVM-
side vs codepoints elsewhere), CJK, combining accents, a 100k-char
single token, and a 100k-char word soup.  No query may throw.
"""

import pytest

import __spark_entry__ as entry
from postfix_log_parser_spark.analytics import TABLES

WEIRD_TEXTS = [
    "",
    "   ",
    "\x01\x02 control \x1f chars \x7f",
    "emoji \U0001F600\U0001F680 soup \U0001F914" * 50,
    "CJK 中文文本 " * 100,
    "mixed éüñ accents " * 80,
    "x" * 100_000,
    "word " * 20_000,
]


@pytest.fixture(scope="module")
def adversarial_sf_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adv_sf")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "documents":
            rows = [
                (900000 + i, w, "xx", "weird", len(w))
                for i, w in enumerate(WEIRD_TEXTS)
            ]
            df = df.unionByName(spark.createDataFrame(rows, df.schema))
        df.write.mode("overwrite").parquet(str(tmp / f"{t}.parquet"))
    return str(tmp)


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_survives_adversarial_text(spark, adversarial_sf_dir, name):
    out = entry.queries()[name](spark, adversarial_sf_dir)
    out.count()  # must execute, not throw
    assert out.columns
