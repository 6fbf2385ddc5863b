"""Streaming sessionizer — ``applyInPandasWithState`` twin of the batch fold.

The reference is a streaming tool: it consumes an unbounded stdin line
stream, keeps per-``queue_id`` dict state, emits an event when ``removed``
arrives, and evicts state entries whose stored first-timestamp is older
than 10 minutes (``lognormalizer/parse.py:272-284`` eviction, ``:380-423``
fold, ``:515`` stdin loop).  This module is the Structured Streaming
mirror:

* **A1/A2** — the per-queue ordered fold runs incrementally in
  ``applyInPandasWithState`` keyed on ``queue_id``: state is the open
  session (fields map, to-list, raw_log, first timestamp), a ``removed``
  row finalizes it (required-key check → event or Q4 fault, state kept
  open on failure exactly like the batch fold / reference).
* **A3** — TTL eviction via **event-time timeout**: the state's timeout is
  ``first_timestamp + ttl`` against the watermark.  The reference mixes
  event time with wall-clock (`now()` vs stored event ts — quirk Q9); a
  replayed-log watermark is the principled streaming equivalent and is the
  documented divergence (SURVEY.md §2.10 Q9).  Evicted sessions surface as
  ``record_type='evicted'`` rows (the reference drops them silently —
  emitting them is strictly more observable; filter them out for parity).
* **J1** — dovecot sieve correlation: dovecot lines carry legacy syslog
  timestamps (no event time) and are keyed by msgid, not queue_id, so they
  cannot enter the keyed fold directly.  They are resolved to candidate
  queues with a **watermarked stream-stream join**: an assignment stream
  (admitted lines carrying ``message-id`` → (msgid, queue_id, ts)) joins a
  dovecot stream (sieve lines with a scan-carried event time) on msgid +
  a time-range bound.  The join's state store holds assignments across
  micro-batches AND partitions, so a sieve line arriving in a later batch
  still correlates — the two streaming stateful operators (join → keyed
  fold) chain in one query.  The fold then applies the action only if the
  session's *current* ``message-id`` equals the msgid — the reference's
  exact predicate (``parse.py:370-375``).  A sieve line whose session was
  already finalized finds no open state — which is the reference's
  behavior too (state is deleted on ``removed``, ``parse.py:353``).
  Residual divergence (documented): a dovecot line with NO preceding
  parseable timestamp in its scan partition has no event time and is
  dropped (real syslog partitions always open with timestamped lines).

Scale design: ``prepare_stream`` is one vectorized Arrow pass (pandas
string ops; the sequential scan only computes per-partition seq and a
carried-forward timestamp), the join keys on msgid with a ±TTL range
bound (state evicted by watermark), the fold shuffles once on the
uniform hex ``queue_id``, and state per key is one bounded session
(5-20 lines) — no skew, no unbounded state.
"""

from __future__ import annotations

import datetime
import re
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from postfix_log_parser_spark.operators.parse import parse_lines
from postfix_log_parser_spark.operators.sessionize import _project_events
from postfix_log_parser_spark.schema import EVENT_COLUMNS

# ---------------------------------------------------------------------------
# prepare_stream: per-partition seq + carry-forward ts + local dovecot keys
# ---------------------------------------------------------------------------

_PREP_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("_dove_ts", T.TimestampType(), True),
    ]
)


def _iso_ts(tok: str) -> datetime.datetime | None:
    try:
        dt = datetime.datetime.fromisoformat(tok)
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return dt


def _prepare_partition(
    pdfs: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    # salt seq with the scan partition id so the fold's (timestamp, seq)
    # sort has distinct tie-breakers across partitions; within a
    # partition, order is scan order.  (Cross-batch ties remain a
    # documented divergence: each micro-batch restarts partition ids.)
    from pyspark import TaskContext

    ctx = TaskContext.get()
    seq0 = (ctx.partitionId() << 40) if ctx is not None else 0
    last_ts: datetime.datetime | None = None
    for pdf in pdfs:
        vals = pdf["value"].astype("string").str.strip().reset_index(drop=True)
        n = len(vals)
        seq = pd.array(range(seq0, seq0 + n), dtype="Int64")
        seq0 += n
        dove_ts: list[Any] = [None] * n
        # dovecot lines have no parseable event time; give them the
        # nearest preceding ISO timestamp in this scan partition (falling
        # back to the carry from earlier chunks) so they can enter the
        # watermarked correlation join.  Scans are short: they break at
        # the first parseable head token.
        dove_mask = (
            vals.str.contains(" Info: sieve: msgid=", regex=False).fillna(False)
        )
        iso_head = vals.str.extract(r"^(\S+) ", expand=False)

        def _nearest_ts_at_or_before(i: int) -> datetime.datetime | None:
            for j in range(i, -1, -1):
                tok = iso_head[j]
                if tok is None or pd.isna(tok):
                    continue
                ts = _iso_ts(tok)
                if ts is not None:
                    return ts
            return None

        if dove_mask.any():
            for i in dove_mask[dove_mask].index:
                found = _nearest_ts_at_or_before(i)
                dove_ts[i] = found if found is not None else last_ts
        # carry the chunk's last parseable timestamp for later chunks
        tail = _nearest_ts_at_or_before(n - 1) if n else None
        if tail is not None:
            last_ts = tail
        out = pd.DataFrame(
            {
                "value": pdf["value"].reset_index(drop=True),
                "seq": seq,
                "_dove_ts": pd.array(dove_ts, dtype="object"),
            }
        )
        yield out


def prepare_stream(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Attach ``seq`` (per scan partition) and a carried-forward event
    time on dovecot lines (``_dove_ts``).  Works on both streaming and
    batch DataFrames (one narrow Arrow pass)."""
    df = lines.select(F.col(line_col).alias("value"))
    return df.mapInPandas(_prepare_partition, _PREP_SCHEMA)


# ---------------------------------------------------------------------------
# the incremental keyed fold
# ---------------------------------------------------------------------------

STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.TimestampType(), True),
        T.StructField("field_keys", T.ArrayType(T.StringType()), True),
        T.StructField("field_vals", T.ArrayType(T.StringType()), True),
        T.StructField("to_list", T.ArrayType(T.StringType()), True),
        T.StructField("raw_log", T.ArrayType(T.StringType()), True),
        T.StructField("version", T.IntegerType(), True),
    ]
)

STREAM_FOLD_SCHEMA = T.StructType(
    [
        T.StructField("record_type", T.StringType(), False),
        T.StructField("queue_id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("to_list", T.ArrayType(T.StringType()), True),
        T.StructField("raw_log", T.ArrayType(T.StringType()), True),
        T.StructField("fault_reason", T.StringType(), True),
        T.StructField("fault_line", T.StringType(), True),
    ]
)

_REQUIRED_KEYS = ("from", "to", "message-id", "status", "status_description")

_STATE_VERSION = 1


def _make_fold(ttl_seconds: int):
    def fold(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        queue_id = key[0]
        out: list[dict[str, Any]] = []

        if state.hasTimedOut:
            # A3: TTL eviction — the reference silently deletes
            # (parse.py:272-284); we surface the dropped session.
            (start_ts, fk, fv, to_list, raw_log, _v) = state.get
            out.append(
                {
                    "record_type": "evicted",
                    "queue_id": queue_id,
                    "timestamp": start_ts,
                    "fields": dict(zip(list(fk or []), list(fv or []))),
                    "to_list": list(to_list or []),
                    "raw_log": list(raw_log or []),
                    "fault_reason": None,
                    "fault_line": None,
                }
            )
            state.remove()
            yield pd.DataFrame(out, columns=[f.name for f in STREAM_FOLD_SCHEMA.fields])
            return

        if state.exists:
            (start_ts, fk, fv, to_list, raw_log, _v) = state.get
            fields = dict(zip(list(fk or []), list(fv or [])))
            to_list = list(to_list or [])
            raw_log = list(raw_log or [])
        else:
            start_ts, fields, to_list, raw_log = None, {}, [], []

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["timestamp", "seq"], kind="stable")

        opened = False  # did this batch leave an open session?
        for row in rows.itertuples(index=False):
            ts = None if pd.isna(row.timestamp) else row.timestamp.to_pydatetime()
            if row.kind == "dovecot" and row.dove_dup:
                # J1: apply only if the session's CURRENT message-id
                # matches (parse.py:370-375); never touches raw_log (Q8)
                if fields and fields.get("message-id") == row.dovecot_msgid:
                    fields["dovecot_fileinto_action"] = row.dovecot_action
                continue
            raw_log.append(row.line)
            if start_ts is None:
                start_ts = ts
            opened = True
            if row.fault_reason is not None and not pd.isna(row.fault_reason):
                # admitted line that raised in the reference (Q12)
                out.append(
                    {
                        "record_type": "fault",
                        "queue_id": queue_id,
                        "timestamp": None,
                        "fields": None,
                        "to_list": None,
                        "raw_log": None,
                        "fault_reason": row.fault_reason,
                        "fault_line": row.line,
                    }
                )
                continue
            if row.kind == "removed":
                missing = next(
                    (
                        k
                        for k in _REQUIRED_KEYS
                        if (k == "to" and not to_list)
                        or (k != "to" and k not in fields)
                    ),
                    None,
                )
                if missing is None:
                    out.append(
                        {
                            "record_type": "event",
                            "queue_id": queue_id,
                            "timestamp": start_ts,
                            "fields": dict(fields),
                            "to_list": list(to_list),
                            "raw_log": list(raw_log),
                            "fault_reason": None,
                            "fault_line": None,
                        }
                    )
                    fields, to_list, raw_log = {}, [], []
                    start_ts, opened = None, False
                else:  # Q4: KeyError → fault, session stays open
                    out.append(
                        {
                            "record_type": "fault",
                            "queue_id": queue_id,
                            "timestamp": None,
                            "fields": None,
                            "to_list": None,
                            "raw_log": None,
                            "fault_reason": f"KeyError: '{missing}'",
                            "fault_line": row.line,
                        }
                    )
                continue
            if row.kind == "subject":
                fields["subject"] = row.subject
                continue
            if row.fields is not None and len(row.fields) > 0:
                for k, v in dict(row.fields).items():
                    fields[k] = v
            if row.to_list is not None and len(row.to_list) > 0:
                to_list.extend(list(row.to_list))
            if row.status_description is not None and not pd.isna(
                row.status_description
            ):
                fields["status_description"] = row.status_description

        if opened or (start_ts is not None and raw_log):
            keys = list(fields.keys())
            state.update(
                (
                    start_ts,
                    keys,
                    [fields[k] for k in keys],
                    list(to_list),
                    list(raw_log),
                    _STATE_VERSION,
                )
            )
            # A3 timeout: first-line event time + TTL (reference:
            # stored ts older than OLD_LOGS=10min → evict), clamped
            # above the current watermark as the API requires.
            timeout_ms = int(start_ts.timestamp() * 1000) + ttl_seconds * 1000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        elif state.exists:
            state.remove()

        yield pd.DataFrame(out, columns=[f.name for f in STREAM_FOLD_SCHEMA.fields])

    return fold


STREAM_OUT_SCHEMA = STREAM_FOLD_SCHEMA


def sessionize_stream(
    lines: DataFrame,
    ttl: str = "10 minutes",
    watermark_delay: str = "10 minutes",
    line_col: str = "value",
) -> DataFrame:
    """Raw streaming text lines → folded session-record stream.

    Output rows carry ``record_type`` ∈ {event, fault, evicted}; use
    ``stream_events`` / ``stream_faults`` to project the batch-compatible
    events / faults shapes.  ``ttl`` mirrors the reference's ``OLD_LOGS``
    10-minute eviction horizon (``parse.py:77``) as an event-time timeout;
    ``watermark_delay`` bounds out-of-order arrival.

    Two chained stateful stages: the msgid correlation join (stream-stream
    inner join, state bounded by watermark + the ±TTL range condition),
    then one hash shuffle on ``queue_id`` into the fold's state store.
    Everything upstream (prepare, parse) is narrow; everything downstream
    (projection) is stateless.
    """
    from postfix_log_parser_spark.operators.parse import _WS

    prepared = prepare_stream(lines, line_col)

    # ONE shared watermark node on a unified event-time column computed
    # CHEAPLY at the prepared level: the line's own ISO head timestamp
    # when parseable, else the scan-carried one (unadmitted dovecot
    # lines).  All three branches below filter FROM this node, so the
    # single logical watermark advances whenever any branch sees rows.
    # Per-branch watermark nodes would break: the optimizer pushes
    # non-event-time filter conjuncts below EventTimeWatermark, after
    # which a dovecot-only node sees no rows on dovecot-free input, and
    # the global min-policy watermark freezes at epoch (TTL eviction
    # never fires).  Keeping the evt computation out of parse_lines also
    # keeps the two JOIN branches lightweight projections — the full
    # parse expression tree is instantiated once (admitted branch), not
    # three times (the triplicated tree overflows the 64KB codegen
    # method limit and drops whole branches to interpreted eval).
    nws = f"[^{_WS[1:-1]}]"  # complement of the Python-whitespace class
    trimmed = F.regexp_replace(F.col("value"), f"^{_WS}+|{_WS}+$", "")
    head = F.regexp_extract(trimmed, f"^({nws}+)", 1)
    head_ts = F.when(
        head.rlike(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}(T.+)?$"), F.try_to_timestamp(head)
    )
    base = prepared.withColumn(
        "evt", F.coalesce(head_ts, F.col("_dove_ts"))
    ).withWatermark("evt", watermark_delay)

    parsed = parse_lines(base, passthrough=("evt",))
    admitted = parsed.filter(F.col("admitted")).select(
        "queue_id",
        # evt == the parsed timestamp for every admitted line (same ISO
        # gate + try_to_timestamp), and it carries the watermark metadata
        # the stateful fold needs
        F.col("evt").alias("timestamp"),
        "seq",
        "line",
        "kind",
        # an ADMITTED line that merely has the dovecot shape must fold
        # its k=v fields like any line — the reference's handler
        # returns False and the line continues (parse.py:362-378);
        # correlation duplicates (dove_dup=true) come from the join
        F.lit(False).alias("dove_dup"),
        "fields",
        "to_list",
        "status_description",
        "subject",
        "dovecot_msgid",
        "dovecot_action",
        "fault_reason",
    )

    # J1 correlation join: assignments (admitted-shaped lines carrying a
    # message-id) ⋈ dovecot sieve lines, on the bracketed msgid (Q8) with
    # a ±TTL time-range bound so both join-state sides are watermark-
    # evicted.  Both sides are cheap regex/token projections, NOT full
    # parses: over-generation is safe because the fold's current-
    # message-id equality check remains the decider (a message-id token
    # on a line the full parse would not fold — e.g. a subject warning
    # line, P9 — yields a candidate no open session matches).
    assign = base.filter(
        trimmed.rlike(f"^{nws}+{_WS}+{nws}+{_WS}+{nws}+{_WS}+[0-9A-F]{{11}}:{_WS}")
        & F.col("evt").isNotNull()
        & trimmed.contains("message-id=")
    ).select(
        # last message-id= token wins (Q1); trailing commas stripped (P2)
        F.regexp_replace(
            # try_: the contains() pre-filter admits mid-token matches the
            # anchored regex rejects (empty array -> NULL, not ANSI error)
            F.try_element_at(
                F.regexp_extract_all(
                    trimmed, F.lit(f"(?:^|{_WS})message-id=({nws}+)"), 1
                ),
                F.lit(-1),
            ),
            ",+$",
            "",
        ).alias("a_msgid"),
        F.regexp_extract(
            trimmed, f"^{nws}+{_WS}+{nws}+{_WS}+{nws}+{_WS}+([0-9A-F]{{11}}):", 1
        ).alias("a_queue"),
        F.col("evt").alias("a_ts"),
    )
    # ANY dovecot-shaped line correlates — admitted or not: the reference
    # handler runs before the admission gates and always returns False
    # (parse.py:362-378, 393-394), so an admitted dovecot-shaped line both
    # folds its k=v fields (admitted branch above) AND updates matching
    # sessions (this branch).  Exact Q8 token-shape check on a local
    # tokens column (the only non-regex work in this branch).
    d_tokens = F.split(trimmed, f"{_WS}+")

    def dt(i: int):
        return F.get(d_tokens, i)

    d_n = F.size(d_tokens)
    is_dove_shape = (
        (d_n >= 9)
        & (dt(4) == "Info:")
        & (dt(5) == "sieve:")
        & dt(6).startswith("msgid=")
        & (dt(7) == "fileinto")
        & (dt(8) == "action:")
    )
    d_msgid_raw = F.substring(dt(6), F.instr(dt(6), "=") + 1, F.length(dt(6)))
    dove = base.filter(is_dove_shape & F.col("evt").isNotNull()).select(
        F.substring(d_msgid_raw, 1, F.length(d_msgid_raw) - 1).alias("d_msgid"),
        F.col("evt").alias("d_ts"),
        F.col("seq").alias("d_seq"),
        trimmed.alias("d_line"),
        F.concat_ws(
            " ", F.slice(d_tokens, 10, F.greatest(d_n - F.lit(9), F.lit(0)))
        ).alias("d_action"),
    )
    resolved = dove.join(
        assign,
        (F.col("d_msgid") == F.col("a_msgid"))
        # symmetric ±TTL bound (matches the docstring): the lower slack
        # covers sieve lines whose carried-forward event time trails the
        # assignment's by out-of-order log timestamps — the seq-based
        # batch path imposes no time bound at all, so the streaming bound
        # must be at least as wide as the arrival disorder the watermark
        # admits.  State cost is symmetric with the upper bound.
        & (F.col("d_ts") >= F.col("a_ts") - F.expr(f"interval {ttl}"))
        & (F.col("d_ts") <= F.col("a_ts") + F.expr(f"interval {ttl}")),
        "inner",
    ).select(
        F.col("a_queue").alias("queue_id"),
        F.col("d_ts").alias("timestamp"),
        F.col("d_seq").alias("seq"),
        F.col("d_line").alias("line"),
        F.lit("dovecot").alias("kind"),
        F.lit(True).alias("dove_dup"),
        F.lit(None).cast("map<string,string>").alias("fields"),
        F.lit(None).cast("array<string>").alias("to_list"),
        F.lit(None).cast("string").alias("status_description"),
        F.lit(None).cast("string").alias("subject"),
        F.col("d_msgid").alias("dovecot_msgid"),
        F.col("d_action").alias("dovecot_action"),
        F.lit(None).cast("string").alias("fault_reason"),
    )

    feed = admitted.unionByName(resolved)
    ttl_seconds = _duration_seconds(ttl)
    return feed.groupBy("queue_id").applyInPandasWithState(
        _make_fold(ttl_seconds),
        STREAM_FOLD_SCHEMA,
        STREAM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _duration_seconds(spec: str) -> int:
    qty, unit = spec.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
    }[unit]
    return int(qty) * mult


def stream_events(folded: DataFrame) -> DataFrame:
    """Project completed sessions to the 22-column EVENTS_SCHEMA (same
    native projection as the batch path)."""
    sessions = folded.filter(F.col("record_type") == "event").select(
        "timestamp",
        "queue_id",
        "fields",
        "to_list",
        "raw_log",
        F.try_element_at(F.col("fields"), F.lit("dovecot_fileinto_action")).alias(
            "_dovecot_final"
        ),
        F.lit(None).cast("long").alias("start_seq"),
        F.lit(None).cast("long").alias("removed_seq"),
    )
    return _project_events(sessions).select(*EVENT_COLUMNS)


def stream_faults(folded: DataFrame) -> DataFrame:
    """Fold-stage faults in the batch fault-channel shape."""
    return folded.filter(F.col("record_type") == "fault").select(
        F.col("fault_line").alias("line"),
        F.col("fault_reason"),
        F.col("queue_id"),
    )


def stream_pre_faults(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Stateless pre-fold faults (short dovecot lines, Q8): these never
    enter the keyed fold (no admission), so surface them directly from a
    second stateless pass — cheap, and keeps the fold single-purpose."""
    parsed = parse_lines(prepare_stream(lines, line_col))
    return parsed.filter((F.col("kind") == "fault") & ~F.col("admitted")).select(
        F.col("line"),
        F.col("fault_reason"),
        F.col("queue_id"),
    )
