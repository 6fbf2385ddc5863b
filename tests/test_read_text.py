"""read_text determinism: the global seq must follow (file name, in-file
position) order regardless of Spark's size-descending split packing."""

from pyspark.sql import functions as F

from postfix_log_parser_spark.sources.text import read_text


def test_multifile_seq_order(spark, tmp_path):
    # deliberately unequal sizes so split packing order != name order
    (tmp_path / "a.log").write_text("\n".join(f"a{i}" for i in range(5)))
    (tmp_path / "b.log").write_text("\n".join(f"b{i}" for i in range(500)))
    (tmp_path / "c.log").write_text("c0")
    df = read_text(spark, str(tmp_path))
    rows = df.orderBy("seq").collect()
    values = [r["value"] for r in rows]
    assert values[:5] == [f"a{i}" for i in range(5)]
    assert values[5:505] == [f"b{i}" for i in range(500)]
    assert values[505:] == ["c0"]
    assert [r["seq"] for r in rows] == list(range(506))


def test_read_text_empty_dir(spark, tmp_path):
    (tmp_path / "empty.log").write_text("")
    df = read_text(spark, str(tmp_path))
    assert df.count() == 0
    assert df.columns == ["value", "seq"]


def test_plan_has_no_global_sort(spark, tmp_path):
    (tmp_path / "a.log").write_text("x\ny")
    df = read_text(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-split offsets are literals joined in — no Exchange, no global Sort
    assert "Exchange" not in plan
    assert "Sort " not in plan
