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
