"""Stage 2 — batch sessionizer: parsed lines → (events, faults, state).

The reference keeps per-``queue_id`` mutable dict state and finalizes a
session when a ``removed`` marker arrives (``lognormalizer/parse.py:
218-423``).  Sessions are marker-terminated (not gap-terminated), the fold
is order-sensitive (quirks Q1-Q4), and a failed finalization (missing
required field → KeyError) leaves the session open (``parse.py:352-353``:
the ``del`` only runs after a successful event construction).

Spark design:

* The per-key ordered fold runs in ``applyInPandas`` over
  ``groupBy(queue_id)`` — one shuffle, hash-partitioned by key, groups are
  tiny (a session is 5-20 lines) and the fold is O(lines).  This is the
  batch twin of the streaming ``applyInPandasWithState`` operator and the
  idiomatic Spark shape for an order-dependent keyed fold (SURVEY.md §2.4
  A1-A2, §7.4).
* Everything *after* the fold — event projection (P4 P5 P6 P11 P12), the
  dovecot correlation join (J1), fault splitting — is native Catalyst.
* The dovecot join replaces the reference's O(open-sessions) linear scan
  per dovecot line (``parse.py:373-375``) with a broadcast hash join on
  msgid validity intervals: exact order semantics (a dovecot line updates a
  session iff the session's *current* ``message-id`` value at that point in
  the log equals the msgid and the session has not been removed yet), at
  hash-join cost.

Known divergences (documented, pathological inputs only): ``k=v`` tokens
named ``raw_log`` or ``timestamp`` would corrupt the reference's state
dict in ways we do not replicate (SURVEY.md §2.10 discussion).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postfix_log_parser_spark.functions.columns import (
    angle_trim,
    domain_of,
    ordered_distinct,
    status_code_pair,
)
from postfix_log_parser_spark.schema import EVENT_COLUMNS

FOLD_SCHEMA = T.StructType(
    [
        T.StructField("record_type", T.StringType(), False),
        T.StructField("queue_id", T.StringType(), False),
        T.StructField("start_seq", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("to_list", T.ArrayType(T.StringType()), True),
        T.StructField("raw_log", T.ArrayType(T.StringType()), True),
        T.StructField("removed_seq", T.LongType(), True),
        T.StructField(
            "msgid_intervals",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("msgid", T.StringType(), True),
                        T.StructField("lo", T.LongType(), True),
                        T.StructField("hi", T.LongType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("kv_dovecot_seq", T.LongType(), True),
        T.StructField("fault_reason", T.StringType(), True),
        T.StructField("fault_line", T.StringType(), True),
        T.StructField("fault_seq", T.LongType(), True),
    ]
)

_REQUIRED_KEYS = ("from", "to", "message-id", "status", "status_description")


def _fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Replay one queue_id's admitted lines in seq order.

    Mirrors ``feed_line`` (``parse.py:380-423``) + ``PostfixEvent.__init__``
    required-key checks (``parse.py:143-150``), including Q4: a ``removed``
    whose event construction would KeyError emits a fault and leaves the
    session open (the removed line stays in raw_log).
    """
    pdf = pdf.sort_values("seq")
    queue_id = pdf["queue_id"].iloc[0]
    out: list[dict[str, Any]] = []

    fields: dict[str, str] = {}
    to_list: list[str] = []
    raw_log: list[str] = []
    first_ts = None
    start_seq = None
    msgid_sets: list[tuple[int, str]] = []  # (seq, raw bracketed value)
    kv_dovecot_seq = None

    def intervals(removed_seq: int | None) -> list[dict[str, Any]]:
        out_iv = []
        for i, (s, v) in enumerate(msgid_sets):
            hi = msgid_sets[i + 1][0] if i + 1 < len(msgid_sets) else removed_seq
            out_iv.append({"msgid": v, "lo": int(s), "hi": None if hi is None else int(hi)})
        return out_iv

    def reset() -> None:
        nonlocal fields, to_list, raw_log, first_ts, start_seq, msgid_sets
        nonlocal kv_dovecot_seq
        fields, to_list, raw_log = {}, [], []
        first_ts, start_seq, msgid_sets, kv_dovecot_seq = None, None, [], None

    def session_row(record_type: str, removed_seq: int | None) -> dict[str, Any]:
        return {
            "record_type": record_type,
            "queue_id": queue_id,
            "start_seq": start_seq,
            "timestamp": first_ts,
            "fields": dict(fields),
            "to_list": list(to_list),
            "raw_log": list(raw_log),
            "removed_seq": removed_seq,
            "msgid_intervals": intervals(removed_seq),
            "kv_dovecot_seq": kv_dovecot_seq,
            "fault_reason": None,
            "fault_line": None,
            "fault_seq": None,
        }

    for row in pdf.itertuples(index=False):
        seq = int(row.seq)
        if start_seq is None:
            start_seq = seq
        raw_log.append(row.line)
        if first_ts is None:
            first_ts = row.timestamp

        if row.kind == "fault":
            out.append(
                {
                    "record_type": "fault",
                    "queue_id": queue_id,
                    "start_seq": start_seq,
                    "timestamp": None,
                    "fields": None,
                    "to_list": None,
                    "raw_log": None,
                    "removed_seq": None,
                    "msgid_intervals": None,
                    "kv_dovecot_seq": None,
                    "fault_reason": row.fault_reason,
                    "fault_line": row.line,
                    "fault_seq": seq,
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
                out.append(session_row("event", seq))
                reset()
            else:
                # Q4: KeyError → fault; state entry survives (del never ran)
                out.append(
                    {
                        "record_type": "fault",
                        "queue_id": queue_id,
                        "start_seq": start_seq,
                        "timestamp": None,
                        "fields": None,
                        "to_list": None,
                        "raw_log": None,
                        "removed_seq": None,
                        "msgid_intervals": None,
                        "kv_dovecot_seq": None,
                        "fault_reason": f"KeyError: '{missing}'",
                        "fault_line": row.line,
                        "fault_seq": seq,
                    }
                )
            continue

        if row.kind == "subject":
            fields["subject"] = row.subject
            continue

        # field / admitted-dovecot line: fold k=v map, to-list, description
        if row.fields is not None:
            for k, v in row.fields.items():
                fields[k] = v
                if k == "message-id":
                    msgid_sets.append((seq, v))
                elif k == "dovecot_fileinto_action":
                    kv_dovecot_seq = seq
        if row.to_list is not None and len(row.to_list) > 0:
            to_list.extend(list(row.to_list))
        if row.status_description is not None:
            fields["status_description"] = row.status_description

    if start_seq is not None:
        out.append(session_row("state", None))

    return pd.DataFrame(out, columns=[f.name for f in FOLD_SCHEMA.fields])


def _project_events(folded: DataFrame) -> DataFrame:
    """P4/P5/P6/P11/P12 — native event projection from folded session state
    (``PostfixEvent.__init__``, ``parse.py:136-168``)."""
    f = lambda k: F.try_element_at(F.col("fields"), F.lit(k))  # noqa: E731
    message_from = angle_trim(f("from"))
    message_to = F.transform(F.col("to_list"), angle_trim)
    pair = status_code_pair(f("status_description"))
    return folded.select(
        F.col("timestamp"),
        F.col("queue_id"),
        domain_of(message_from).alias("domain_from"),
        ordered_distinct(F.transform(message_to, domain_of)).alias("domains_to"),
        message_from.alias("message_from"),
        message_to.alias("message_to"),
        angle_trim(f("message-id")).alias("message_id"),
        f("subject").alias("message_subject"),
        f("status").alias("status"),
        pair["status_code"].alias("status_code"),
        pair["status_postfix_code"].alias("status_postfix_code"),
        f("status_description").alias("status_description"),
        f("client").alias("client"),
        f("orig_to").alias("orig_to"),
        F.col("_dovecot_final").alias("dovecot_fileinto_action"),
        f("delay").alias("delay"),
        f("delays").alias("delays"),
        f("dsn").alias("dsn"),
        f("nrcpt").alias("nrcpt"),
        f("relay").alias("relay"),
        f("size").alias("size"),
        F.col("raw_log"),
        F.col("start_seq").alias("_start_seq"),
        F.col("removed_seq").alias("_removed_seq"),
    )


def sessionize(
    parsed: DataFrame, keep_order_columns: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Sessionize a parsed-line DataFrame.

    Returns ``(events, faults, state)``:

    * ``events`` — the 22-column `EVENTS_SCHEMA` DataFrame, one row per
      completed session (quirk Q5: rows may carry NULL status codes; the
      sink projection routes those to faults — see ``sources.sinks``).
    * ``faults`` — (line, fault_reason, queue_id): every line the reference
      would route to ``on_fault`` (quirk Q12).
    * ``state`` — residual open sessions (the reference's ``parser.state``)
      for introspection / streaming hand-off.

    Set ``keep_order_columns=True`` to retain ``_start_seq``/``_removed_seq``
    on events (deterministic ordering for tests).
    """
    # faults raised before any state effect (dovecot-shape IndexError):
    pre_faults = parsed.filter(
        (F.col("kind") == "fault") & ~F.col("admitted")
    ).select(
        F.col("line"),
        F.col("fault_reason"),
        F.col("queue_id"),
    )

    feed = parsed.filter(F.col("admitted")).select(
        "seq",
        "line",
        "kind",
        "timestamp",
        "queue_id",
        "fields",
        "to_list",
        "status_description",
        "subject",
        "fault_reason",
    )
    folded = feed.groupBy("queue_id").applyInPandas(_fold_group, FOLD_SCHEMA)

    # ---- J1: dovecot sieve correlation as a broadcast hash join over
    # msgid validity intervals (replaces the reference's linear state scan).
    dovecot = parsed.filter(F.col("kind") == "dovecot").select(
        F.col("seq").alias("dov_seq"),
        F.col("dovecot_msgid").alias("dov_msgid"),
        F.col("dovecot_action").alias("dov_action"),
    )
    sessions = folded.filter(F.col("record_type") != "fault")
    iv = sessions.select(
        "record_type",
        "queue_id",
        "start_seq",
        F.explode(F.col("msgid_intervals")).alias("iv"),
    )
    matched = (
        iv.join(
            F.broadcast(dovecot),
            (F.col("iv.msgid") == F.col("dov_msgid"))
            & (F.col("dov_seq") > F.col("iv.lo"))
            & (F.col("iv.hi").isNull() | (F.col("dov_seq") < F.col("iv.hi"))),
            "inner",
        )
        .groupBy("record_type", "queue_id", "start_seq")
        .agg(
            F.max_by("dov_action", "dov_seq").alias("dov_action"),
            F.max("dov_seq").alias("dov_seq"),
        )
    )
    sessions = sessions.join(
        matched, ["record_type", "queue_id", "start_seq"], "left"
    ).withColumn(
        "_dovecot_final",
        # the later setter wins: a k=v dovecot_fileinto_action=... token vs
        # the dovecot handler (both plain dict assignments in the reference)
        F.when(
            F.col("dov_seq").isNotNull()
            & (
                F.col("kv_dovecot_seq").isNull()
                | (F.col("dov_seq") > F.col("kv_dovecot_seq"))
            ),
            F.col("dov_action"),
        ).otherwise(
            F.try_element_at(F.col("fields"), F.lit("dovecot_fileinto_action"))
        ),
    )

    events = _project_events(sessions.filter(F.col("record_type") == "event"))
    if not keep_order_columns:
        events = events.select(*EVENT_COLUMNS)

    fold_faults = folded.filter(F.col("record_type") == "fault").select(
        F.col("fault_line").alias("line"),
        F.col("fault_reason"),
        F.col("queue_id"),
    )
    faults = pre_faults.unionByName(fold_faults)

    state = sessions.filter(F.col("record_type") == "state").select(
        "queue_id",
        "timestamp",
        "fields",
        "to_list",
        "raw_log",
        F.col("_dovecot_final").alias("dovecot_fileinto_action"),
    )
    return events, faults, state
