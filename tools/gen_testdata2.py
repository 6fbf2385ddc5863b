"""Second-seed synthetic corpus generator (VERDICT r8 action item #4).

The driver's testdata is seed=42; every local green is therefore "green
on that corpus".  This generator reproduces the same ten-table star
schema — identical column names, arrow types, row counts, and
distribution SHAPES (sampled from /root/testdata/sf0.01) — from a
different seed, so running tools/check_contract.py against its output
converts value-hash parity into "green on the GENERATOR": any
accidental fit to seed-42 byte patterns (a rounding boundary that only
balances on those values, an ordering that only ties one way) breaks
loudly here.

Usage: python tools/gen_testdata2.py [out_dir] [seed]
Default: .testdata/seed7/sf0.01 under the repo root, seed 7.

Values are intentionally NOT byte-derived from the driver corpus — only
shapes are matched: TPC-H-ish dims/facts, 2024-01 month of events in ts
order, 500 vocab-sampled documents (uniform sources, en-heavy langs),
500 unit-norm 64-dim embeddings with 10 labels.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US_PER_DAY = 86_400_000_000

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["small", "red", "blue", "hot", "cold", "old", "new", "big"]
NOUNS = ["ring", "widget", "bolt", "gear", "anvil", "plate", "rod", "gizmo"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.44, 0.14, 0.14, 0.13, 0.15]
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch a the "
    "spark window order data column join small line customer query group "
    "big vector sort stream filter"
).split()


def _ts_array(us_list):
    return pa.array(us_list, type=pa.timestamp("us"))


def generate(out_dir: str, seed: int = 7) -> None:
    rng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    # --- dims -----------------------------------------------------------
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust, n_supp, n_part, n_ord, n_li = 1500, 100, 2000, 15000, 60000
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            [rng.randrange(25) for _ in range(n_cust)], pa.int32()),
        "c_acctbal": [round(rng.uniform(-999.0, 9999.0), 2)
                      for _ in range(n_cust)],
        "c_mktsegment": [rng.choice(SEGMENTS) for _ in range(n_cust)],
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            [rng.randrange(25) for _ in range(n_supp)], pa.int32()),
        "s_acctbal": [round(rng.uniform(0.0, 9999.0), 2)
                      for _ in range(n_supp)],
    }))
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{rng.choice(ADJS)} {rng.choice(NOUNS)}"
                   for _ in range(n_part)],
        "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(n_part)],
        "p_type": [rng.choice(TYPES) for _ in range(n_part)],
        "p_size": pa.array(
            [rng.randrange(1, 51) for _ in range(n_part)], pa.int32()),
        "p_retailprice": [round(900.0 + 0.1 * i, 1) for i in range(n_part)],
    }))

    # --- facts ----------------------------------------------------------
    epoch_1995 = 9131 * US_PER_DAY  # days from 1970-01-01 to 1995-01-01
    order_day = [rng.randrange(0, 2405) for _ in range(n_ord)]  # ..2001-08
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(
            [rng.randrange(n_cust) for _ in range(n_ord)], pa.int64()),
        "o_orderstatus": [rng.choice("FPO") for _ in range(n_ord)],
        "o_totalprice": [round(rng.uniform(1000.0, 500000.0), 2)
                         for _ in range(n_ord)],
        "o_orderdate": _ts_array(
            [epoch_1995 + d * US_PER_DAY for d in order_day]),
        "o_orderpriority": [rng.choice(PRIORITIES) for _ in range(n_ord)],
    }))
    li_order = [rng.randrange(n_ord) for _ in range(n_li)]
    linenumber, seen = [], {}
    for ok in li_order:
        seen[ok] = seen.get(ok, 0) % 7 + 1
        linenumber.append(seen[ok])
    write("lineitem", pa.table({
        "l_orderkey": pa.array(li_order, pa.int64()),
        "l_partkey": pa.array(
            [rng.randrange(n_part) for _ in range(n_li)], pa.int64()),
        "l_suppkey": pa.array(
            [rng.randrange(n_supp) for _ in range(n_li)], pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": [float(rng.randrange(1, 51)) for _ in range(n_li)],
        "l_extendedprice": [round(rng.uniform(901.0, 105000.0), 2)
                            for _ in range(n_li)],
        "l_discount": [round(rng.randrange(0, 11) * 0.01, 2)
                       for _ in range(n_li)],
        "l_tax": [round(rng.randrange(0, 9) * 0.01, 2) for _ in range(n_li)],
        "l_returnflag": [rng.choice("ANR") for _ in range(n_li)],
        "l_linestatus": [rng.choice("FO") for _ in range(n_li)],
        "l_shipdate": _ts_array(
            [epoch_1995 + (order_day[ok] + rng.randrange(1, 96)) * US_PER_DAY
             for ok in li_order]),
    }))

    # --- events (ts-ordered stream over one month) -----------------------
    n_ev = 10000
    epoch_2024 = 19723 * US_PER_DAY  # 2024-01-01
    gaps = nrng.exponential(30 * US_PER_DAY / n_ev, n_ev).astype("int64")
    ts = epoch_2024 + np.cumsum(gaps)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_array(ts.tolist()),
        "user_id": pa.array(
            [rng.randrange(150) for _ in range(n_ev)], pa.int64()),
        "event_type": [rng.choice(EVENT_TYPES) for _ in range(n_ev)],
        "value": [round(max(0.01, rng.expovariate(1 / 50.0)), 2)
                  for _ in range(n_ev)],
        "props": ['{"k": %d}' % rng.randrange(1, 100) for _ in range(n_ev)],
    }))

    # --- documents --------------------------------------------------------
    n_doc = 500
    texts = []
    for _ in range(n_doc):
        target = rng.randrange(48, 554)
        words = []
        size = 0
        while size < target:
            w = rng.choice(VOCAB)
            size += len(w) + (1 if words else 0)
            words.append(w)
        texts.append(" ".join(words)[:target])
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [rng.choices(LANGS, weights=LANG_W)[0] for _ in range(n_doc)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings (unit-norm 64-dim, 10 labels) -------------------------
    n_vec, dim = 500, 64
    vecs = nrng.standard_normal((n_vec, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array(
            [v.astype("float32").tolist() for v in vecs],
            pa.list_(pa.float32())),
        "label": pa.array(
            [rng.randrange(10) for _ in range(n_vec)], pa.int32()),
    }))
    print(f"wrote 10 tables to {out_dir} (seed={seed})")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata", "seed7", "sf0.01",
    )
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    generate(out, seed)
