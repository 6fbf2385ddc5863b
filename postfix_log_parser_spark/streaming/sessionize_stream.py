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
  cannot enter the keyed fold directly.  ``prepare_stream`` resolves them
  **scan-locally**: while attaching the per-partition ``seq`` it tracks
  msgid→queue assignments seen earlier in the same scan partition and
  duplicates each dovecot line to every candidate queue (with a
  carried-forward event time so it survives the watermark).  The fold then
  applies the action only if the session's *current* ``message-id`` equals
  the msgid — the reference's exact predicate (``parse.py:370-375``).
  Divergence (documented): a dovecot line whose msgid assignment happened
  in a *different* scan partition / earlier micro-batch is not correlated.
  In real logs the sieve line lands directly after the delivery lines of
  its session, so partition-local resolution covers the practical case;
  the batch path (`operators.sessionize`) is exact for replays.

Scale design: ``prepare_stream`` is one vectorized Arrow pass (pandas
string ops; the sequential scan touches only the rare msgid/dovecot
candidate rows), the fold shuffles once on the uniform hex ``queue_id``,
and state per key is one bounded session (5-20 lines) — no skew, no
unbounded state (the TTL timeout bounds abandoned sessions).
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
        T.StructField("_dove_queue", T.StringType(), True),
        T.StructField("_dove_ts", T.TimestampType(), True),
    ]
)

# an admitted line head: ts host proc QUEUEID: …  (F1-F3 shape)
_ADMIT_HEAD = re.compile(r"^(\S+)\s+\S+\s+\S+\s+([0-9A-F]{11}):\s")
_MSGID_TOK = re.compile(r"message-id=(\S+)")


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
    seq0 = 0
    last_ts: datetime.datetime | None = None
    assigns: dict[str, list[str]] = {}  # msgid -> queues (partition-local)
    for pdf in pdfs:
        vals = pdf["value"].astype("string").str.strip().reset_index(drop=True)
        n = len(vals)
        seq = pd.array(range(seq0, seq0 + n), dtype="Int64")
        seq0 += n
        out = pd.DataFrame(
            {
                "value": pdf["value"].reset_index(drop=True),
                "seq": seq,
                "_dove_queue": pd.array([None] * n, dtype="string"),
                "_dove_ts": pd.array([None] * n, dtype="object"),
            }
        )
        # candidate masks (vectorized); the sequential scan below only
        # touches these rare rows
        dove_mask = vals.str.contains(" Info: sieve: msgid=", regex=False)
        msgid_mask = vals.str.contains("message-id=", regex=False)
        extra_rows: list[dict[str, Any]] = []
        dove_mask = dove_mask.fillna(False)
        msgid_mask = msgid_mask.fillna(False)
        for i in sorted(
            set(dove_mask[dove_mask].index) | set(msgid_mask[msgid_mask].index)
        ):
            line = vals[i]
            toks = line.split()
            ts = _iso_ts(toks[0]) if toks else None
            if ts is not None:
                last_ts = ts
            m = _ADMIT_HEAD.match(line)
            if m and ts is not None and msgid_mask[i]:
                # admitted line assigning message-id: last k=v token wins
                hits = _MSGID_TOK.findall(line)
                if hits:
                    msgid = hits[-1].rstrip(",")
                    assigns.setdefault(msgid, [])
                    if m.group(2) not in assigns[msgid]:
                        assigns[msgid].append(m.group(2))
            if (
                len(toks) >= 9
                and toks[4] == "Info:"
                and toks[5] == "sieve:"
                and toks[6].startswith("msgid=")
                and toks[7] == "fileinto"
                and toks[8] == "action:"
            ):
                msgid_raw = toks[6].split("=", 1)[1][:-1]
                for q in assigns.get(msgid_raw, []):
                    extra_rows.append(
                        {
                            "value": line,
                            "seq": int(out.at[i, "seq"]),
                            "_dove_queue": q,
                            "_dove_ts": last_ts,
                        }
                    )
        # carry-forward event time is only needed on duplicated dovecot
        # rows; normal rows parse their own timestamp downstream
        if extra_rows:
            out = pd.concat([out, pd.DataFrame(extra_rows)], ignore_index=True)
        yield out


def prepare_stream(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Attach ``seq`` (per scan partition) and resolve dovecot lines to
    candidate queue keys with a carried-forward event time.  Works on both
    streaming and batch DataFrames (one narrow Arrow pass)."""
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

    One wide stage: hash shuffle on ``queue_id`` into the state store.
    Everything upstream (prepare, parse) is narrow; everything downstream
    (projection) is stateless.
    """
    prepared = prepare_stream(lines, line_col)
    parsed = parse_lines(prepared, passthrough=("_dove_queue", "_dove_ts"))

    feed = parsed.filter(
        F.col("admitted")
        | ((F.col("kind") == "dovecot") & F.col("_dove_queue").isNotNull())
    ).select(
        F.coalesce(F.col("_dove_queue"), F.col("queue_id")).alias("queue_id"),
        F.coalesce(F.col("_dove_ts"), F.col("timestamp")).alias("timestamp"),
        "seq",
        "line",
        "kind",
        # correlation duplicates (scan-local dovecot resolution) vs an
        # ADMITTED line that merely has the dovecot shape: the latter must
        # fold its k=v fields like any line — the reference's handler
        # returns False and the line continues (parse.py:362-378)
        F.col("_dove_queue").isNotNull().alias("dove_dup"),
        "fields",
        "to_list",
        "status_description",
        "subject",
        "dovecot_msgid",
        "dovecot_action",
        "fault_reason",
    )
    ttl_seconds = _duration_seconds(ttl)
    feed = feed.withWatermark("timestamp", watermark_delay)
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
