"""q172 incremental connected components — the MERGE path.

The contract corpus mostly exercises attach-to-existing-component; this
test crafts a corpus where the wave-2 doc is Jaccard-similar to TWO
previously-separate base components (similarity is not transitive:
J(wave, A) ≥ .5 and J(wave, B) ≥ .5 while J(A, B) < .5), so the
incremental path must MERGE them — relabeling the losing component's
members — to agree with a from-scratch rebuild.

Geometry (word-3-gram shingles):
  X  = 8 vocab words                        (doc 15; wave copies doc 15)
  XW = X + " second wave ingest pad"        (the wave doc, 700015)
  Y  = X's last 5 words + the pad           (doc 10)
J(XW, X) = 0.600, J(XW, Y) = 0.700, but J(X, Y) = 0.300 — the wave doc
bridges two components that share no in-threshold pair.  Docs 11/16 are
suffix-padded twins of 10/15 so both sides are real multi-member
components before the wave arrives.

The words below were searched (md5 minhash replicated in Python) so
every required edge ALSO lands a band collision: banded LSH has
deterministic-but-probabilistic recall below J=1 (what q132 measures),
and a first draft of this test failed precisely because two J=0.6
edges missed all 4 bands — the expectation, not the engine, was wrong.
Everything is md5-derived, so the collision pattern is stable forever.
"""

from postfix_log_parser_spark.ext.dedup import (
    q36_dedup_components,
    q172_incremental_components,
)

X = "nu xi beta iota pi eta upsilon epsilon"
Y = "iota pi eta upsilon epsilon second wave ingest pad"


def _write_docs(spark, tmp_path):
    docs = [
        (10, Y, "s"),
        (11, Y + " taily", "s"),
        (15, X, "s"),
        (16, X + " tailx", "s"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_wave_doc_merges_two_base_components(spark, tmp_path):
    sf = _write_docs(spark, tmp_path)

    base = {
        r.doc_id: r.component_id
        for r in q36_dedup_components(spark, sf).collect()
    }
    # before the wave: two separate components
    assert base == {10: 10, 11: 10, 15: 15, 16: 15}

    merged = {
        r.doc_id: r.component_id
        for r in q172_incremental_components(spark, sf).collect()
    }
    # after: the wave doc (700015 = 15 + WAVE2_OFFSET) bridges them;
    # every member — including the relabeled {15, 16} side — lands on
    # the global min id 10, exactly what a from-scratch rebuild yields
    assert merged == {10: 10, 11: 10, 15: 10, 16: 10, 700015: 10}

    # the base map must not have been mutated in place (it is a staged
    # artifact other queries read)
    base_again = {
        r.doc_id: r.component_id
        for r in q36_dedup_components(spark, sf).collect()
    }
    assert base_again == base
