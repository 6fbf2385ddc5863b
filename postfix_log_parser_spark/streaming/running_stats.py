"""transformWithStateInPandas — Spark 4's arbitrary-state streaming API.

``applyInPandasWithState`` (the sessionize fold's engine) hands the user
one opaque state tuple per key; ``transformWithState`` (4.0+) replaces it
with an evolvable OPERATOR model: named typed state variables
(ValueState / ListState / MapState), per-variable TTL, event- and
processing-time timers, and schema evolution of state between runs.  This
module exercises the API with the simplest genuinely-stateful shape — a
per-key running counter that must survive micro-batch boundaries — so the
engine covers both stateful APIs, not just the 3.x one.

Scale notes: transformWithState requires the RocksDB state-store provider
(incremental checkpointing, changelog uploads — the provider you want at
100 TB state anyway); the query scopes that conf.  State is keyed on the
group key, so parallelism is `shuffle.partitions` like every stateful op.
"""

from __future__ import annotations

import importlib.util
from typing import Any, Iterator

import pandas as pd

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

# The transformWithState Python runner speaks a protobuf state-server
# protocol to the JVM; without the protobuf package the runner crashes at
# init (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE,
# "cannot import name 'descriptor' from 'google.protobuf'").  This
# container ships no protobuf and installs are off-limits (re-checked
# r9/r10/r11/r12 — still absent), so the q113 contract query registers only
# where the runtime is whole; the processor logic itself is unit-tested
# against a mock handle either way.
def _has_tws_runtime() -> bool:
    try:  # find_spec("google.protobuf") raises if the namespace pkg is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


HAS_TWS_RUNTIME = _has_tws_runtime()

OUTPUT_SCHEMA = "event_type string, n_seen bigint, sum_cents bigint"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningStats(StatefulProcessor):
    """Per-key running (count, exact-cents sum) in a ValueState.

    Emits the UPDATED running totals once per (key, micro-batch) — the
    cross-batch monotone growth of ``n_seen`` is what proves state
    persisted across batch boundaries (the test pins it)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, s bigint"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        prior = self._totals.get()
        n, s = (int(prior[0]), int(prior[1])) if prior is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            s += int(pdf["cents"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_seen": [n], "sum_cents": [s]}
        )

    def close(self) -> None:
        pass
