"""q122 Naive-Bayes classifier invariants beyond the oracle compare."""

from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.classify import q122_nb_source_classifier


def test_q122_confusion_matrix_covers_every_test_doc(spark):
    sf = "/root/testdata/sf0.001"
    out = q122_nb_source_classifier(spark, sf)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .filter(F.col("doc_id") % 2 == 1)
    )
    # exactly one prediction per non-empty-word test doc
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda w: w != F.lit("")
    )
    n_test = docs.filter(F.size(words) > 0).count()
    assert total == n_test


def test_q122_predictions_are_deterministic_across_repartition(spark):
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, q122_nb_source_classifier(spark, sf).collect()))
    b = sorted(map(tuple, q122_nb_source_classifier(spark, sf).collect()))
    assert a == b


def test_q123_deciles_are_uniform_within_each_source(spark):
    """A correct quantile transform puts n/10 ± 1 docs in every decile."""
    from postfix_log_parser_spark.ext.textstats import q123_quality_calibration

    rows = q123_quality_calibration(spark, "/root/testdata/sf0.001").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, ds in by_src.items():
        n = sum(r.n_docs for r in ds)
        assert len(ds) == min(10, n)
        for r in ds:
            assert abs(r.n_docs - n / 10) <= 1, (src, r.decile, r.n_docs, n)
        # deciles must tile the score range monotonically
        ds.sort(key=lambda r: r.decile)
        for lo, hi in zip(ds, ds[1:]):
            assert lo.max_score <= hi.min_score
