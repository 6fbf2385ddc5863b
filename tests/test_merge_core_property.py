"""Property test for merge_pairs_into_components (q172/q173's core):
for ANY edge set split into (already-clustered, newly-arrived), folding
the new edges into the CC of the old ones must equal CC over the union
— including multi-component merges, chains of new nodes bridging old
components, and the empty-batch / empty-base boundaries.

Seeds are fixed, so the graphs are deterministic; the Python reference
is a union-find with min-id canonical labels (the same component-id
convention as q36)."""

import random

import pytest

from postfix_log_parser_spark.ext.dedup import merge_pairs_into_components


def _cc(edges):
    """{node: min reachable node} over nodes that appear in any edge."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", range(8))
def test_incremental_merge_equals_full_cc(spark, seed):
    rnd = random.Random(seed)
    n = rnd.randint(4, 14)
    edges = sorted({
        tuple(sorted(rnd.sample(range(n), 2)))
        for _ in range(rnd.randint(2, 14))
    })
    cut = rnd.randint(0, len(edges))
    first, second = edges[:cut], edges[cut:]

    base = _cc(first)
    base_df = spark.createDataFrame(
        sorted(base.items()), "doc_id long, component_id long"
    ) if base else spark.createDataFrame(
        [], "doc_id long, component_id long"
    )
    pairs_df = spark.createDataFrame(
        second, "id_a long, id_b long"
    ) if second else spark.createDataFrame([], "id_a long, id_b long")

    merged = merge_pairs_into_components(base_df, pairs_df)
    got = {r.doc_id: r.component_id for r in merged.collect()}
    assert got == _cc(edges), (seed, first, second)


@pytest.mark.parametrize("seed", range(4))
def test_distributed_cc_path_equals_driver_path(spark, seed):
    """_hash_min_cc is a bounded-probe hybrid: graphs within the probe
    limit run driver-side union-find, oversized ones the distributed
    hash-min loop.  Force the distributed path (driver_limit=0) and
    require identical labels — the fallback must never drift from the
    fast path."""
    from postfix_log_parser_spark.ext.dedup import _hash_min_cc

    rnd = random.Random(2000 + seed)
    n = rnd.randint(4, 12)
    edges = sorted({
        tuple(sorted(rnd.sample(range(n), 2)))
        for _ in range(rnd.randint(2, 12))
    })
    edges_df = spark.createDataFrame(edges, "a long, b long")
    fast = {(r.id, r.comp) for r in _hash_min_cc(edges_df).collect()}
    dist = {(r.id, r.comp)
            for r in _hash_min_cc(edges_df, driver_limit=0).collect()}
    assert fast == dist == set(_cc(edges).items())


@pytest.mark.parametrize("seed", range(8))
def test_incremental_delete_equals_full_cc(spark, seed):
    """q174's core: deleting ANY doc subset from CC(edges) via
    delete_docs_from_components must equal CC over the surviving edges —
    including component splits (the deleted doc was the only bridge),
    whole-component dissolutions, deletion of the min-id member
    (relabel), and deletions of unclustered ids (no-ops)."""
    from postfix_log_parser_spark.ext.dedup import delete_docs_from_components

    rnd = random.Random(1000 + seed)
    n = rnd.randint(4, 14)
    edges = sorted({
        tuple(sorted(rnd.sample(range(n), 2)))
        for _ in range(rnd.randint(2, 16))
    })
    # deletion set: biased toward clustered nodes (so splits/relabels
    # actually happen) plus ids outside the graph (no-op path)
    nodes = sorted({x for e in edges for x in e})
    deleted = sorted(
        set(rnd.sample(nodes, rnd.randint(0, max(1, len(nodes) // 2))))
        | {n + 5}
    )

    base = _cc(edges)
    base_df = spark.createDataFrame(
        sorted(base.items()), "doc_id long, component_id long"
    )
    pairs_df = spark.createDataFrame(edges, "id_a long, id_b long")
    del_df = spark.createDataFrame([(d,) for d in deleted], "doc_id long")

    got_df = delete_docs_from_components(base_df, pairs_df, del_df)
    got = {r.doc_id: r.component_id for r in got_df.collect()}
    surviving = [
        (a, b) for a, b in edges if a not in deleted and b not in deleted
    ]
    assert got == _cc(surviving), (seed, edges, deleted)


@pytest.mark.parametrize("seed", range(6))
def test_streamed_update_sequence_equals_full_cc(spark, tmp_path, seed):
    """The STREAMING update path (q173's `_update_components`, with the
    doc-bucketed mirror and the frozen txn): for ANY edge set split into
    ANY number of arrival batches, folding them sequentially through the
    two-layout state must equal union-find over the union — and the
    mirror must hold exactly the comp-keyed map's rows after every
    batch."""
    from postfix_log_parser_spark.ext.streamcc import (
        _COMP_SCHEMA,
        _MIRROR_SCHEMA,
        _update_components,
    )

    rnd = random.Random(3000 + seed)
    n = rnd.randint(4, 16)
    edges = sorted({
        tuple(sorted(rnd.sample(range(n), 2)))
        for _ in range(rnd.randint(2, 16))
    })
    # split into 1-4 batches, some possibly empty
    n_batches = rnd.randint(1, 4)
    batches = [[] for _ in range(n_batches)]
    for e in edges:
        batches[rnd.randrange(n_batches)].append(e)

    work = str(tmp_path / "w")
    import os

    os.makedirs(work)

    def rows(d, schema):
        if not os.path.exists(d):
            return set()
        return {
            (r.doc_id, r.component_id)
            for r in spark.read.schema(schema).parquet(d)
            .select("doc_id", "component_id").collect()
        }

    seen = []
    for i, batch in enumerate(batches):
        pairs = spark.createDataFrame(
            batch, "id_a long, id_b long"
        ) if batch else spark.createDataFrame([], "id_a long, id_b long")
        _update_components(spark, work, pairs, f"b{i}")
        seen.extend(batch)
        comp = rows(f"{work}/components", _COMP_SCHEMA)
        mirror = rows(f"{work}/components_by_doc", _MIRROR_SCHEMA)
        assert comp == set(_cc(seen).items()), (seed, i, batches)
        assert mirror == comp, (seed, i, "mirror drifted from the map")
