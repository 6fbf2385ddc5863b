"""Shared bucketed-state-table machinery for the maintained stores.

Four families keep long-lived, partition-pruned parquet state: the
streaming component map (``ext/streamcc.py`` — bands, shingles, pairs,
component map + doc-bucketed mirror), the streaming ANN code store
(``ext/streamann.py`` — cell-partitioned PQ codes), the streaming BM25
index (``ext/streambm25.py`` — term-bucketed postings, doc-bucketed
docstats), and the events table + rollup MV (``sinks.py`` —
date-partitioned).  Until r11 each implemented its own copy of the same
discipline — explicit-schema pruned reads, partition-scoped dynamic
overwrite with a drained-directory sweep, bounded bucket-plan collects,
rename-swapped compaction — and the r10 streamann schema-inference bug
was exactly a drift failure of that unshared discipline.  This module
is the single implementation (the r11 verdict's #1 action item).

**The layout manifest.**  Bucket assignment for probe pruning used to be
recomputed from a module constant (``N_STATE_BUCKETS = 16``) at read
time: a store written under one constant and probed by a build with
another — the obvious 100 TB operational change is raising bucket
counts — would prune to the WRONG buckets and silently drop state rows.
Every ``StateTable`` therefore persists ``_manifest.json`` at creation
(layout version, partition column, bucket count, key function
description, an optional key fingerprint such as a codebook hash, and
the row schema) and validates it on every open; a mismatch raises
``StateLayoutError`` instead of returning silently-wrong prunes.  The
manifest file is underscore-prefixed, so Spark's file index and
DuckDB's glob both ignore it.

Reference scope: operational extension — the reference appends to one
ClickHouse table forever (``lognormalizer/parse.py:515-516``); the
maintained-state families are the 100 TB continuous-ingest story built
on top of that contract.
"""

from __future__ import annotations

import json
import os
import shutil
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"
LAYOUT_VERSION = 1


class StateLayoutError(RuntimeError):
    """A state directory's persisted layout disagrees with the layout
    the running code would use — reading on would prune to the wrong
    partitions and silently drop rows, so the open is refused."""


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Scope ``partitionOverwriteMode=dynamic`` to one write and restore
    the previous value (static mode would truncate the whole table)."""
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(conf_key, old)


def hash_bucket(col: Column, n_buckets: int) -> Column:
    """The canonical bucket assignment: ``pmod(xxhash64(key), N)``."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


class StateTable:
    """One partition-pruned parquet state table.

    ``schema`` is the FULL schema string including the partition column;
    ``partition_col`` names that column.  ``n_buckets`` is set for
    hash-bucketed layouts (``bucket = pmod(xxhash64(key), n_buckets)``)
    and ``None`` for layouts whose partition values are assigned by the
    caller (IVF cells, event dates) — then ``key_desc`` documents the
    assignment and ``key_fingerprint`` pins its parameters (e.g. a
    codebook hash), so a store written under one assignment refuses a
    probe under another.

    Every read goes through the explicit schema (a partitioned state dir
    can legally hold zero parquet footers — the r10 empty-table lesson),
    and every open validates the persisted manifest.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: str | None,
        partition_col: str = "bucket",
        n_buckets: int | None = None,
        key_desc: str = "",
        key_fingerprint: str = "",
    ):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.partition_col = partition_col
        self.n_buckets = n_buckets
        self.key_desc = key_desc
        self.key_fingerprint = key_fingerprint
        self._validated = False

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "StateTable | None":
        """Open an existing store BY ITS MANIFEST — the reader derives
        the layout (bucket count, key, schema) from what the store
        records instead of a build-time constant, so a probe keeps
        working across layout migrations.  Returns None when no
        manifest exists (a pre-manifest or foreign directory)."""
        mpath = os.path.join(path, MANIFEST_NAME)
        if not os.path.isfile(mpath):
            return None
        with open(mpath) as fh:
            m = json.load(fh)
        return cls(
            spark,
            path,
            schema=m["schema"],
            partition_col=m["partition_col"],
            n_buckets=m["n_buckets"],
            key_desc=m["key_desc"],
            key_fingerprint=m["key_fingerprint"],
        )

    # ---------------------------------------------------------- layout

    @property
    def row_schema(self) -> str:
        """The schema minus the partition column (per-partition files
        don't store it — it lives in the directory name)."""
        assert self.schema is not None, "schema-less table (inferred reads)"
        fields = [
            f for f in self.schema.split(", ")
            if not f.startswith(self.partition_col + " ")
        ]
        return ", ".join(fields)

    def _manifest(self) -> dict:
        return {
            "layout_version": LAYOUT_VERSION,
            "partition_col": self.partition_col,
            "n_buckets": self.n_buckets,
            "key_desc": self.key_desc,
            "key_fingerprint": self.key_fingerprint,
            "schema": self.schema,
        }

    def bucket_of(self, col: Column) -> Column:
        assert self.n_buckets is not None, "not a hash-bucketed layout"
        return hash_bucket(col, self.n_buckets)

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    def validate(self) -> None:
        """Refuse to open a store whose persisted layout disagrees with
        this table's; adopt (write the manifest for) a pre-manifest
        store, which by construction was written by the same build."""
        if self._validated:
            return
        mpath = os.path.join(self.path, MANIFEST_NAME)
        if os.path.isfile(mpath):
            with open(mpath) as fh:
                on_disk = json.load(fh)
            want = self._manifest()
            diffs = {
                k: (on_disk.get(k), want[k])
                for k in want
                if on_disk.get(k) != want[k]
                # an opener that passes no fingerprint makes no claim
                # about the key parameters — it must not refuse a store
                # that records them (the store's own creator pinned them)
                and not (k == "key_fingerprint" and want[k] == "")
            }
            if diffs:
                raise StateLayoutError(
                    f"state table {self.path} was written under a different "
                    f"layout; refusing to read (pruning would silently drop "
                    f"rows). mismatched fields (on_disk, expected): {diffs}"
                )
        elif self.exists():
            self._write_manifest()
        self._validated = True

    def _write_manifest(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".{MANIFEST_NAME}.tmp")
        with open(tmp, "w") as fh:
            json.dump(self._manifest(), fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, MANIFEST_NAME))

    def partition_dir(self, value) -> str:
        return os.path.join(self.path, f"{self.partition_col}={value}")

    # ----------------------------------------------------------- reads

    def read(self, partitions=None) -> DataFrame:
        """Explicit-schema read, PRUNED to ``partitions`` when given (a
        bounded list the caller collected — the partition filter is the
        plan-level guarantee that a probe touches query-proportional
        state, not the corpus)."""
        self.validate()
        reader = self.spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.parquet(self.path)
        if partitions is not None:
            df = df.filter(F.col(self.partition_col).isin(sorted(partitions)))
        return df

    def partitions_of(self, df: DataFrame, expr: Column | None = None) -> list:
        """The distinct partition values a frame touches — one bounded
        collect (≤ n_buckets for hash layouts), the probe-planning step
        every pruned access starts with."""
        col = expr if expr is not None else F.col(self.partition_col)
        return sorted({
            r.p for r in df.select(col.alias("p")).distinct().collect()
        })

    # ---------------------------------------------------------- writes

    def _colocated(self, df: DataFrame) -> DataFrame:
        """One shuffle of the INCOMING rows (never of the store) so each
        write lands one file per touched partition per batch instead of
        |tasks|×|partitions| fragments."""
        col = F.col(self.partition_col)
        if self.n_buckets is not None:
            return df.repartition(self.n_buckets, col)
        return df.repartition(col)

    def _ensure_manifest(self) -> None:
        if not os.path.isfile(os.path.join(self.path, MANIFEST_NAME)):
            self._write_manifest()

    def append(self, df: DataFrame, colocate: bool = True) -> None:
        """Append one batch's rows to their partitions (the ingest path
        of the append-only tables)."""
        self.validate()
        self._ensure_manifest()
        out = self._colocated(df) if colocate else df
        (
            out.write.mode("append")
            .partitionBy(self.partition_col)
            .parquet(self.path)
        )

    def overwrite_partitions(
        self, touched: list, new_rows: DataFrame, **write_options
    ) -> set:
        """Partition-scoped advance: dynamic partition overwrite replaces
        exactly the partition directories present in ``new_rows`` (the
        caller eagerly checkpointed it first — its rows were computed
        FROM the directories being overwritten); a touched partition
        that received no rows was fully drained by the change and its
        stale directory is swept explicitly.  Returns the set of
        partition values actually written."""
        self.validate()
        self._ensure_manifest()
        with dynamic_partition_overwrite(self.spark):
            w = new_rows.write.mode("overwrite")
            for k, v in write_options.items():
                w = w.option(k, v)
            w.partitionBy(self.partition_col).parquet(self.path)
        # compare as directory-name strings: touched may carry ints or
        # date strings while the collected values are ints or date
        # objects — a type mismatch here would sweep LIVE partitions
        written = {
            str(r.p)
            for r in new_rows.select(
                F.col(self.partition_col).alias("p")
            ).distinct().collect()
        }
        for v in {str(t) for t in touched} - written:
            shutil.rmtree(self.partition_dir(v), ignore_errors=True)
        return written

    # ------------------------------------------------------- migration

    def migrate(self, target: "StateTable", key_col: str) -> int:
        """Resumable, exactly-once layout migration — the action the
        manifest refusal demands (a 100 TB store raising its bucket
        count can't just flip the constant; the data must be
        re-bucketed under a NEW manifest).

        One SOURCE partition at a time: its rows are re-bucketed under
        ``target``'s layout into a dot-prefixed staging dir, then moved
        into the target partitions under DETERMINISTIC file names
        (``mig-<src>-<dst>.parquet`` — one file per (source, target)
        partition pair, so a crash-resumed redo overwrites its own
        earlier copies instead of duplicating rows), then the source
        partition's done-marker is written.  A crash resumes at the
        first unmarked partition; the unit of work and of retry is one
        partition directory.  The source store is never modified.
        Returns the number of source partitions migrated this call."""
        self.validate()
        target.validate()
        target._ensure_manifest()
        os.makedirs(os.path.join(target.path, "_migrated"), exist_ok=True)
        done = 0
        for name in sorted(os.listdir(self.path)):
            if not name.startswith(f"{self.partition_col}="):
                continue
            pval = name.split("=", 1)[1]
            marker = os.path.join(target.path, "_migrated", name)
            if os.path.exists(marker):
                continue
            rows = self.spark.read.schema(self.row_schema).parquet(
                os.path.join(self.path, name)
            )
            rebucketed = rows.withColumn(
                target.partition_col, target.bucket_of(F.col(key_col))
            )
            staged = os.path.join(target.path, f".mig-{pval}")
            (
                rebucketed.repartition(
                    target.n_buckets, F.col(target.partition_col)
                )
                .write.mode("overwrite")
                .partitionBy(target.partition_col)
                .parquet(staged)
            )
            for bname in sorted(os.listdir(staged)):
                if not bname.startswith(f"{target.partition_col}="):
                    continue
                bval = bname.split("=", 1)[1]
                tdir = target.partition_dir(bval)
                os.makedirs(tdir, exist_ok=True)
                parts = sorted(
                    p for p in os.listdir(os.path.join(staged, bname))
                    if p.endswith(".parquet")
                )
                for i, p in enumerate(parts):
                    os.replace(
                        os.path.join(staged, bname, p),
                        os.path.join(tdir, f"mig-{pval}-{bval}-{i:03d}.parquet"),
                    )
            shutil.rmtree(staged, ignore_errors=True)
            with open(marker, "w") as fh:
                fh.write("done\n")
            done += 1
        return done

    # ------------------------------------------------------ compaction

    def recover_compaction(self) -> None:
        """Heal a crash mid-``compact``: a retired dir whose replacement
        never landed is the data — restore it; stale staging dirs are
        discarded."""
        if not os.path.isdir(self.path):
            return
        for name in sorted(os.listdir(self.path)):
            if name.startswith(".compact-"):
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
            elif name.startswith(".old-"):
                orig = os.path.join(self.path, name[len(".old-"):])
                if not os.path.exists(orig):
                    os.rename(os.path.join(self.path, name), orig)
                else:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def compact(
        self,
        max_files: int = 4,
        dedup_keys: list | None = None,
        dedup_agg: dict | None = None,
    ) -> int:
        """Bounded small-files maintenance: rewrite ONLY the partitions
        whose parquet file count exceeds ``max_files`` — each rewritten
        content-identically (or, when ``dedup_keys``/``dedup_agg`` name
        the read-side replay-dedup keys, with duplicate rows physically
        collapsed) and swapped in by rename; staging and retired dirs
        are dot-prefixed so Spark's file index never sees them, and a
        crash mid-swap is healed by ``recover_compaction`` at the next
        call.  Run between batches, never concurrently with a writer.
        Returns the number of partitions compacted."""
        self.validate()
        if not os.path.isdir(self.path):
            return 0
        self.recover_compaction()
        row_schema = self.row_schema
        row_cols = [f.split(" ")[0] for f in row_schema.split(", ")]
        done = 0
        for name in sorted(os.listdir(self.path)):
            if not name.startswith(f"{self.partition_col}="):
                continue
            bdir = os.path.join(self.path, name)
            parts = [p for p in os.listdir(bdir) if p.endswith(".parquet")]
            if len(parts) <= max_files:
                continue
            df = self.spark.read.schema(row_schema).parquet(bdir)
            if dedup_keys:
                aggs = [
                    getattr(F, how)(c).alias(c)
                    for c, how in (dedup_agg or {}).items()
                ]
                df = df.groupBy(*dedup_keys).agg(*aggs) if aggs else (
                    df.dropDuplicates(dedup_keys)
                )
                df = df.select(*row_cols)
            staged = os.path.join(self.path, f".compact-{name}")
            df.repartition(1).write.mode("overwrite").parquet(staged)
            retired = os.path.join(self.path, f".old-{name}")
            os.rename(bdir, retired)
            os.rename(staged, bdir)
            shutil.rmtree(retired, ignore_errors=True)
            done += 1
        return done
