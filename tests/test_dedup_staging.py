"""The q22→q36 LSH+CC pipeline is staged per (session, sf_dir).

Four contract queries consume it (q36 components, q120 survivors, q132
recall audit, q154 split leakage); before staging, a contract/bench run
executed the fleet's most expensive pipeline four times.  These tests
pin that exactly ONE pair-list computation and ONE component-map
computation happen per process per sf_dir, and that the staged frames
still answer correctly.
"""

import pytest

from postfix_log_parser_spark.ext import dedup
from postfix_log_parser_spark.ext.leakage import q154_split_leakage

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def fresh_stage():
    dedup._PAIR_STAGE.clear()
    dedup._COMP_STAGE.clear()
    yield
    dedup._PAIR_STAGE.clear()
    dedup._COMP_STAGE.clear()


def test_lsh_cc_pipeline_computes_once(spark, fresh_stage):
    before = dict(dedup.STAGE_COMPUTES)
    n_pairs = dedup.q22_dedup_minhash_lsh(spark, SF_DIR).count()
    comps = dedup.q36_dedup_components(spark, SF_DIR)
    n_comp_rows = comps.count()
    dedup.q120_cluster_survivors(spark, SF_DIR).count()
    dedup.q132_lsh_recall(spark, SF_DIR).count()
    q154_split_leakage(spark, SF_DIR).count()
    assert dedup.STAGE_COMPUTES["pairs"] - before["pairs"] == 1
    assert dedup.STAGE_COMPUTES["components"] - before["components"] == 1
    # the staged frames are real results, not empty placeholders: the
    # augmented corpus plants near-dup copies, so pairs/components exist
    assert n_pairs > 0 and n_comp_rows > 0


def test_stage_is_keyed_by_sf_dir(spark, fresh_stage, tmp_path):
    """A different corpus dir must NOT hit another dir's staged pairs."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta", "s", "en")],
        "doc_id long, text string, source string, lang string",
    )
    other = str(tmp_path / "corpus")
    docs.write.parquet(f"{other}/documents.parquet")
    before = dedup.STAGE_COMPUTES["pairs"]
    dedup.q22_dedup_minhash_lsh(spark, SF_DIR).count()
    dedup.q22_dedup_minhash_lsh(spark, other).count()
    assert dedup.STAGE_COMPUTES["pairs"] - before == 2
    # and repeat calls on both keys hit the stage
    dedup.q22_dedup_minhash_lsh(spark, SF_DIR).count()
    dedup.q22_dedup_minhash_lsh(spark, other).count()
    assert dedup.STAGE_COMPUTES["pairs"] - before == 2


def test_q160_component_split_has_zero_straddle(spark):
    """The repair's defining property: after component-keyed assignment,
    every near-dup component's members share ONE split — the leakage
    q154 measures is zero by construction."""
    from pyspark.sql import functions as F

    from postfix_log_parser_spark.ext.dedup import _augmented, q36_dedup_components
    from postfix_log_parser_spark.ext.leakage import _split_of

    comps = q36_dedup_components(spark, SF_DIR)
    key = F.col("component_id")
    labeled = comps.select(
        "component_id", _split_of(F.coalesce(key, F.col("doc_id"))).alias("split")
    )
    straddle = (
        labeled.groupBy("component_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0
    # and the split totals cover the whole augmented corpus
    from postfix_log_parser_spark.ext import EXT_QUERIES

    out = EXT_QUERIES["q160_component_split"](spark, SF_DIR).collect()
    n_total = _augmented(spark, SF_DIR).count()
    assert sum(r.n_docs for r in out) == n_total
