"""bench.py's BENCH_QUERIES must track the driver contract: every
registered query is benchmarked (no silent perf blind spots), and every
benchmarked name resolves."""

import importlib.util


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_list_matches_registered_queries():
    bench = _load("/root/repo/bench.py", "bench_mod")
    entry = _load("/root/repo/__spark_entry__.py", "entry_mod")
    registered = set(entry.queries())
    listed = set(bench.BENCH_QUERIES)
    assert listed - registered == set(), "bench names that do not resolve"
    assert registered - listed == set(), "queries missing from the bench"
    assert len(bench.BENCH_QUERIES) == len(listed), "duplicate bench entries"
