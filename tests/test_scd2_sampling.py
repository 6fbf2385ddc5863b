"""Behavioral invariants for SCD2 compaction (q61) and weighted
reservoir sampling (q62).  Value-level parity is the oracle harness's
job; these pin the semantic guarantees."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_scd2_intervals_chain_and_single_current(spark):
    from postfix_log_parser_spark.analytics import q61_scd2_user_state

    rows = q61_scd2_user_state(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        # versions are contiguous from 1
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        # exactly one open (current) interval, and it is the last version
        current = [r for r in hist if r.is_current]
        assert len(current) == 1 and current[0].version == len(hist)
        # intervals chain: valid_to(k) == valid_from(k+1), no gaps/overlap
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.valid_from_us <= a.valid_to_us


def test_weighted_sample_shape_and_weight_bias(spark):
    from postfix_log_parser_spark.ext.sampling import SAMPLE_K, q62_weighted_sample

    rows = q62_weighted_sample(spark, SF_DIR).collect()
    assert len(rows) == SAMPLE_K
    assert sorted(r.sample_rank for r in rows) == list(range(1, SAMPLE_K + 1))
    assert len({r.doc_id for r in rows}) == SAMPLE_K  # without replacement
    # n_chars-weighted: the sample must over-represent long documents
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pop_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > pop_mean


def test_weighted_sample_stable_under_repartitioning(spark):
    """The md5-keyed sample is a function of the DATA, not the layout:
    shuffling the input into a different partitioning yields the
    identical sample (the property RNG-based sampling lacks)."""
    from postfix_log_parser_spark.ext.sampling import q62_weighted_sample, weighted_sample

    a = {(r.sample_rank, r.doc_id) for r in q62_weighted_sample(spark, SF_DIR).collect()}
    shuffled = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .repartition(7, "source")
        .sortWithinPartitions(F.col("doc_id").desc())
    )
    b = {(r.sample_rank, r.doc_id) for r in weighted_sample(shuffled).collect()}
    assert a == b


def test_bigram_lm_scores_every_normalizable_doc(spark):
    from postfix_log_parser_spark.ext.textstats import q63_bigram_lm_quality

    rows = q63_bigram_lm_quality(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_scorable = docs.filter(
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9 ]+", " ")) >= 2
    ).count()
    assert len(rows) == n_scorable
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_nll > 0
        assert r.keep == (r.avg_nll < 8.0) or abs(r.avg_nll - 8.0) < 1e-3


def test_bigram_lm_model_fits_training_source_best(spark):
    """The reference-source documents must score (weakly) better than the
    corpus at large — the model was trained on them."""
    from postfix_log_parser_spark.ext.textstats import q63_bigram_lm_quality

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ref = docs.agg(F.min("source")).collect()[0][0]
    scored = q63_bigram_lm_quality(spark, SF_DIR).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    means = dict(
        scored.groupBy(F.col("source") == ref)
        .agg(F.avg("avg_nll"))
        .collect()
    )
    assert means[True] <= means[False] + 0.1


def test_profile_counts_match_table(spark):
    from postfix_log_parser_spark.ext.profile import q64_table_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    rows = {r.col_name: r for r in q64_table_profile(spark, SF_DIR).collect()}
    assert set(rows) == {"doc_id", "lang", "source", "n_chars", "text"}
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert r.n_distinct <= n - r.n_nulls
    assert rows["doc_id"].n_distinct == n  # primary key


def test_funnel_stages_are_monotone(spark):
    from postfix_log_parser_spark.analytics import q66_funnel

    r = q66_funnel(spark, SF_DIR).collect()[0]
    assert r.n_users >= r.n_viewed >= r.n_clicked_after_view >= r.n_purchased_after_click
    assert r.n_purchased_after_click >= 0


def test_retention_cohort_offsets_nonnegative_and_complete(spark):
    from postfix_log_parser_spark.analytics import q67_retention_cohorts

    rows = q67_retention_cohorts(spark, SF_DIR).collect()
    assert rows
    assert all(r.day_offset >= 0 for r in rows)
    # day 0 of every cohort contains the cohort itself (first event day)
    day0 = {r.cohort_day for r in rows if r.day_offset == 0}
    assert day0 == {r.cohort_day for r in rows}


def test_ols_outputs_are_sane(spark):
    from postfix_log_parser_spark.ext.textstats import q65_ols_tokens_vs_chars

    rows = q65_ols_tokens_vs_chars(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        assert r.slope > 0  # more chars -> more tokens, always on this data


def test_incremental_dedup_matches_are_new_vs_index(spark):
    """Every match pairs a new-batch doc (id >= 100000) with an index doc,
    and each perturbed copy finds its own original when LSH recalls it."""
    from postfix_log_parser_spark.ext.dedup import q69_incremental_dedup

    rows = q69_incremental_dedup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.new_id >= 100000 and r.index_id < 100000
        assert 0.0 <= r.jaccard <= 1.0
    # self-match recall: most perturbed copies should hit their original
    self_matches = [r for r in rows if r.new_id - 100000 == r.index_id]
    assert len(self_matches) >= len({r.new_id for r in rows}) * 0.8
