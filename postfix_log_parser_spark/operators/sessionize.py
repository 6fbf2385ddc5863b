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
from pyspark.sql import Column, DataFrame
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


_ENTRY_ARRAY_T = "array<struct<eseq:bigint,key:string,value:string>>"

_FOLD_ROW_T = (
    "struct<record_type:string,start_seq:bigint,timestamp:timestamp,"
    "fields:map<string,string>,to_list:array<string>,raw_log:array<string>,"
    "removed_seq:bigint,msgid_intervals:array<struct<msgid:string,lo:bigint,"
    "hi:bigint>>,kv_dovecot_seq:bigint,fault_reason:string,fault_line:string,"
    "fault_seq:bigint>"
)

# accumulator for the per-queue linear fold: required-key presence flags
# since the last successful boundary, successful-removed seqs, failed
# removals (Q4) with the first missing key.
_ACC_INIT = (
    "named_struct("
    "'f', false, 't', false, 'm', false, 's', false, 'd', false,"
    "'bnd', cast(array() as array<bigint>),"
    "'fails', cast(array() as array<struct<seq:bigint,missing:string>>))"
)


def _last_wins_fields(entries: Column) -> Column:
    """Fold (eseq, key, value) entries — already in seq order — into a
    last-wins map: reverse, keep first occurrence per key.  O(n·k) on
    tiny per-session entry lists; conf-independent (no map dedup policy)."""
    return F.aggregate(
        F.reverse(entries),
        F.expr("map()").cast("map<string,string>"),
        lambda acc, e: F.when(
            F.array_contains(F.map_keys(acc), e["key"]), acc
        ).otherwise(F.map_concat(acc, F.create_map(e["key"], e["value"]))),
    )


def _empty_str_array() -> Column:
    return F.array().cast("array<string>")


def _boundary_fold(xs: Column) -> Column:
    """Linear fold over a queue's sorted lines, reproducing ``feed_line``'s
    finalization semantics exactly (``lognormalizer/parse.py:341-355`` +
    ``PostfixEvent`` required keys ``parse.py:143-150``):

    a ``removed`` marker closes the session ONLY if every required field
    has been set since the previous successful boundary; otherwise the
    reference raises KeyError → fault and the session stays open (Q4).
    Returns ``struct(bnd: array<seq of successful removed>, fails:
    array<(seq, first-missing-key)>)``."""

    def has_key(x: Column, k: str) -> Column:
        return F.exists(x["entries"], lambda e: e["key"] == k)

    def step(acc: Column, x: Column) -> Column:
        is_removed = x["kind"] == F.lit("removed")
        ok = acc["f"] & acc["t"] & acc["m"] & acc["s"] & acc["d"]
        # first missing key in the reference's required-key order
        missing = (
            F.when(~acc["f"], F.lit("from"))
            .when(~acc["t"], F.lit("to"))
            .when(~acc["m"], F.lit("message-id"))
            .when(~acc["s"], F.lit("status"))
            .otherwise(F.lit("status_description"))
        )
        reset_flags = [
            F.lit(False).alias(n) for n in ("f", "t", "m", "s", "d")
        ]
        closed = F.struct(
            *reset_flags,
            F.concat(acc["bnd"], F.array(x["seq"])).alias("bnd"),
            acc["fails"].alias("fails"),
        )
        failed = F.struct(
            acc["f"].alias("f"),
            acc["t"].alias("t"),
            acc["m"].alias("m"),
            acc["s"].alias("s"),
            acc["d"].alias("d"),
            acc["bnd"].alias("bnd"),
            F.concat(
                acc["fails"],
                F.array(F.struct(x["seq"].alias("seq"), missing.alias("missing"))),
            ).alias("fails"),
        )
        folded_line = F.struct(
            (acc["f"] | has_key(x, "from")).alias("f"),
            (
                acc["t"]
                | (F.size(F.coalesce(x["to_list"], _empty_str_array())) > 0)
            ).alias("t"),
            (acc["m"] | has_key(x, "message-id")).alias("m"),
            (acc["s"] | has_key(x, "status")).alias("s"),
            (acc["d"] | has_key(x, "status_description")).alias("d"),
            acc["bnd"].alias("bnd"),
            acc["fails"].alias("fails"),
        )
        return (
            F.when(is_removed & ok, closed)
            .when(is_removed, failed)
            .otherwise(folded_line)
        )

    return F.aggregate(xs, F.expr(_ACC_INIT), step)


def _session_row(s: Column, k: Column, bnd: Column) -> Column:
    """FOLD-row struct for one session (array expression; ``s`` is the
    session's sorted line structs, ``k`` its index, ``bnd`` the successful
    boundary seqs — session k is closed iff k < size(bnd))."""
    removed_seq = F.get(bnd, k)  # null for the trailing open session
    entries_flat = F.flatten(F.transform(s, lambda x: x["entries"]))
    fields = _last_wins_fields(entries_flat)
    to_list = F.flatten(
        F.transform(s, lambda x: F.coalesce(x["to_list"], _empty_str_array()))
    )
    assigns = F.filter(entries_flat, lambda e: e["key"] == "message-id")
    n_assign = F.size(assigns)
    intervals = F.when(
        n_assign > 0,
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_assign - F.lit(1), F.lit(0))),
            lambda i: F.struct(
                F.get(assigns, i)["value"].alias("msgid"),
                F.get(assigns, i)["eseq"].alias("lo"),
                F.coalesce(F.get(assigns, i + F.lit(1))["eseq"], removed_seq).alias(
                    "hi"
                ),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<msgid:string,lo:bigint,hi:bigint>>")
    )
    kv_dovecot_seq = F.try_element_at(
        F.filter(entries_flat, lambda e: e["key"] == "dovecot_fileinto_action"),
        F.lit(-1),
    )["eseq"]
    return F.struct(
        F.when(k < F.size(bnd), F.lit("event"))
        .otherwise(F.lit("state"))
        .alias("record_type"),
        F.get(s, 0)["seq"].alias("start_seq"),
        F.get(s, 0)["timestamp"].alias("timestamp"),
        fields.alias("fields"),
        to_list.alias("to_list"),
        F.transform(s, lambda x: x["line"]).alias("raw_log"),
        removed_seq.alias("removed_seq"),
        intervals.alias("msgid_intervals"),
        kv_dovecot_seq.alias("kv_dovecot_seq"),
        F.lit(None).cast("string").alias("fault_reason"),
        F.lit(None).cast("string").alias("fault_line"),
        F.lit(None).cast("long").alias("fault_seq"),
    )


def _fault_row(reason: Column, line: Column, seq: Column) -> Column:
    return F.struct(
        F.lit("fault").alias("record_type"),
        F.lit(None).cast("long").alias("start_seq"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit(None).cast("map<string,string>").alias("fields"),
        F.lit(None).cast("array<string>").alias("to_list"),
        F.lit(None).cast("array<string>").alias("raw_log"),
        F.lit(None).cast("long").alias("removed_seq"),
        F.lit(None)
        .cast("array<struct<msgid:string,lo:bigint,hi:bigint>>")
        .alias("msgid_intervals"),
        F.lit(None).cast("long").alias("kv_dovecot_seq"),
        reason.alias("fault_reason"),
        line.alias("fault_line"),
        seq.alias("fault_seq"),
    )


def _fold_native(feed: DataFrame) -> DataFrame:
    """Catalyst-only fold: parsed lines → per-session FOLD rows.

    ONE hash shuffle (``groupBy(queue_id)``) and ONE explode; everything
    else is array expressions over the per-queue sorted line list:

    1. ``_boundary_fold`` — linear accumulator fold finds the seqs of
       *successful* ``removed`` markers (reference Q4: a removed whose
       session misses a required key faults and leaves the session open)
       and the failed removals with their KeyError key.
    2. Split lines into sessions on those boundaries (a removed closes
       the session it belongs to), build one FOLD-row struct per session,
       plus fault rows for failed removals and admitted line-faults
       (subject/MIME IndexError parity, Q8/Q12).
    3. ``explode`` the combined row array.

    Per-queue_id data is bounded (a mail session is 5-20 lines) and the
    key is uniform uppercase hex — no skew handling needed.  This is the
    exact semantic twin of ``_fold_group`` (the pandas oracle, kept for
    differential tests via ``use_native=False``).
    """
    desc_entry = F.array(
        F.struct(
            F.col("seq").alias("eseq"),
            F.lit("status_description").alias("key"),
            F.col("status_description").alias("value"),
        )
    )
    subject_entry = F.array(
        F.struct(
            F.col("seq").alias("eseq"),
            F.lit("subject").alias("key"),
            F.col("subject").alias("value"),
        )
    )
    kv_entries = F.transform(
        F.map_entries(F.col("fields")),
        lambda e: F.struct(
            F.col("seq").alias("eseq"), e["key"].alias("key"), e["value"].alias("value")
        ),
    )
    empty = F.array().cast(_ENTRY_ARRAY_T)
    line_entries = F.concat(
        F.when(F.col("fields").isNotNull(), kv_entries).otherwise(empty),
        F.when(F.col("status_description").isNotNull(), desc_entry).otherwise(empty),
        F.when(F.col("kind") == "subject", subject_entry).otherwise(empty),
    )

    lines = feed.select(
        "queue_id",
        F.struct(
            F.col("seq"),
            F.col("line"),
            F.col("timestamp"),
            F.col("kind"),
            line_entries.alias("entries"),
            F.col("to_list"),
            F.col("fault_reason"),
        ).alias("x"),
    )
    g = lines.groupBy("queue_id").agg(
        F.sort_array(F.collect_list("x")).alias("xs")
    )

    xs = F.col("xs")
    fold = _boundary_fold(xs)
    g = g.withColumn("bnd", fold["bnd"]).withColumn("fails", fold["fails"])
    bnd = F.col("bnd")

    # session index of a line = number of successful boundaries before it;
    # a successful removed closes its own session, a failed one does not
    # split (Q4).
    sessions = F.transform(
        F.sequence(F.lit(0), F.size(bnd)),
        lambda k: F.filter(
            xs, lambda x: F.size(F.filter(bnd, lambda b: b < x["seq"])) == k
        ),
    )
    session_rows = F.filter(
        F.transform(
            sessions,
            lambda s, k: F.when(F.size(s) > 0, _session_row(s, k, bnd)),
        ),
        lambda r: r.isNotNull(),
    )
    fail_rows = F.transform(
        F.col("fails"),
        lambda f: _fault_row(
            F.concat(F.lit("KeyError: '"), f["missing"], F.lit("'")),
            F.get(F.filter(xs, lambda x: x["seq"] == f["seq"]), 0)["line"],
            f["seq"],
        ),
    )
    line_fault_rows = F.transform(
        F.filter(xs, lambda x: x["kind"] == "fault"),
        lambda x: _fault_row(x["fault_reason"], x["line"], x["seq"]),
    )
    all_rows = F.concat(session_rows, fail_rows, line_fault_rows)

    r = F.col("r")
    return g.select("queue_id", F.explode(all_rows).alias("r")).select(
        r["record_type"].alias("record_type"),
        "queue_id",
        r["start_seq"].alias("start_seq"),
        r["timestamp"].alias("timestamp"),
        r["fields"].alias("fields"),
        r["to_list"].alias("to_list"),
        r["raw_log"].alias("raw_log"),
        r["removed_seq"].alias("removed_seq"),
        r["msgid_intervals"].alias("msgid_intervals"),
        r["kv_dovecot_seq"].alias("kv_dovecot_seq"),
        r["fault_reason"].alias("fault_reason"),
        r["fault_line"].alias("fault_line"),
        r["fault_seq"].alias("fault_seq"),
    )


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
    parsed: DataFrame,
    keep_order_columns: bool = False,
    use_native: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Sessionize a parsed-line DataFrame.

    Returns ``(events, faults, state)``:

    * ``events`` — the 22-column `EVENTS_SCHEMA` DataFrame, one row per
      completed session (quirk Q5: rows may carry NULL status codes; the
      sink projection routes those to faults — see ``sinks.route_sink_faults``).
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
    if use_native:
        folded = _fold_native(feed)
    else:
        folded = feed.groupBy("queue_id").applyInPandas(_fold_group, FOLD_SCHEMA)

    # ---- J1: dovecot sieve correlation.  Dovecot lines are collected
    # into one sorted broadcast array and matched per session with an
    # array expression over the msgid validity intervals — the folded
    # sessions are consumed exactly ONCE (no explode + join-back, which
    # would re-execute the fold aggregate).  Replaces the reference's
    # O(open-sessions) linear scan per dovecot line (parse.py:373-375).
    # Assumption: sieve-correlation lines are a small fraction of the log
    # (they ride a broadcast); if that ever broke, switch to an interval
    # equi-join on msgid.
    dovs = parsed.filter(F.col("kind") == "dovecot").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("seq").alias("dseq"),
                    F.col("dovecot_msgid").alias("dmsgid"),
                    F.col("dovecot_action").alias("daction"),
                )
            )
        ).alias("_dovs")
    )
    sessions = folded.filter(F.col("record_type") != "fault").crossJoin(
        F.broadcast(dovs)
    )
    ivs = F.col("msgid_intervals")
    best = F.try_element_at(
        F.filter(
            F.col("_dovs"),
            lambda d: F.exists(
                ivs,
                lambda iv: (iv["msgid"] == d["dmsgid"])
                & (d["dseq"] > iv["lo"])
                & (iv["hi"].isNull() | (d["dseq"] < iv["hi"])),
            ),
        ),
        F.lit(-1),
    )
    sessions = sessions.withColumn(
        "_dovecot_final",
        # the later setter wins: a k=v dovecot_fileinto_action=... token vs
        # the dovecot handler (both plain dict assignments in the reference)
        F.when(
            best.isNotNull()
            & (
                F.col("kv_dovecot_seq").isNull()
                | (best["dseq"] > F.col("kv_dovecot_seq"))
            ),
            best["daction"],
        ).otherwise(
            F.try_element_at(F.col("fields"), F.lit("dovecot_fileinto_action"))
        ),
    ).drop("_dovs")

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
