"""Deterministic sf-scaled corpus generator for the oracle gate.

Generates the same ten tables as ``/root/testdata/sf*`` (schemas are
cloned from the sf0.001 parquet footers, so column types — including
the TIMESTAMP(NANOS) events quirk — match byte-for-byte) at an
arbitrary scale factor, mimicking the real corpus' distributions:
key ranges, enum domains (5 langs / 20 sources / 5 event types /
25 brands / 6 part types), value ranges, the 2024-01 events window,
the 1995-2001 order/ship window, 1-7 lineitems per order with
shipdate >= orderdate, the ~30-word document vocabulary at 10-100
words per doc, dense doc_id/vec_id, n_chars == len(text), event_id
in timestamp order.

Purpose (VERDICT r6 item 5): run the cross-engine gate one decade
ABOVE the bench scale — the sf0.1 sweep caught bugs the smaller SFs
never did; sf1 buys the next decade of evidence. This is NOT the
driver's generator (seed/codepaths unknown); the gate compares Spark
vs DuckDB on the SAME parquet, so statistical fidelity — not
bit-equality with the driver's corpus — is what matters.

Deterministic: numpy PCG64 seed=7; identical output on every run.

Usage: python tools/make_scaled_data.py [sf] [out_dir]
       (defaults: 1.0 /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_VOCAB = (
    "batch part spark line column order small sort fast value scan a "
    "hash slow group query big filter key window row table stream "
    "merge data agg vector join customer the"
).split()
_LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en ~2x the rest
_SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_PADJ = ["large", "hot", "blue", "small", "red", "green", "shiny", "dark"]
_PNOUN = ["ring", "bolt", "screw", "plate", "gear", "wheel", "pin", "cap"]
_STATUS = ["O", "P", "F"]
_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_ETYPES = ["view", "click", "signup", "purchase", "error"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _schema(name: str) -> pa.Schema:
    return pq.read_schema(os.path.join(REF_DIR, f"{name}.parquet"))


def _write(out: str, name: str, cols: dict) -> None:
    tbl = pa.Table.from_pydict(cols).cast(_schema(name))
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {tbl.num_rows} rows")


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(7)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_ev_users = int(15_000 * sf)

    _write(out, "region", {
        "r_regionkey": list(range(5)), "r_name": _REGIONS,
    })
    _write(out, "nation", {
        "n_nationkey": list(range(25)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": [i % 5 for i in range(25)],
    })
    _write(out, "customer", {
        "c_custkey": np.arange(n_cust),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype("int32"),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [_SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    })
    _write(out, "supplier", {
        "s_suppkey": np.arange(n_supp),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype("int32"),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })
    padj = rng.integers(0, len(_PADJ), n_part)
    pnoun = rng.integers(0, len(_PNOUN), n_part)
    _write(out, "part", {
        "p_partkey": np.arange(n_part),
        "p_name": [f"{_PADJ[a]} {_PNOUN[b]}" for a, b in zip(padj, pnoun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [_PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype("int32"),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10, 1),
    })

    # orders: 1995-01-01 .. 2001-08-01 midnights
    d0 = np.datetime64("1995-01-01")
    odays = rng.integers(0, 2405, n_ord)
    odate = d0 + odays.astype("timedelta64[D]")
    _write(out, "orders", {
        "o_orderkey": np.arange(n_ord),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": [_STATUS[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": [_PRIO[i] for i in rng.integers(0, 5, n_ord)],
    })

    # lineitem: 1..7 lines per order (avg 4), shipdate >= orderdate
    nlines = rng.integers(1, 8, n_ord)
    lok = np.repeat(np.arange(n_ord), nlines)
    n_li = len(lok)
    lnum = np.concatenate([np.arange(1, k + 1) for k in nlines])
    qty = rng.integers(1, 51, n_li).astype("float64")
    unit = rng.uniform(900, 2100, n_li)
    sdate = (
        np.repeat(odate, nlines)
        + rng.integers(1, 96, n_li).astype("timedelta64[D]")
    )
    _write(out, "lineitem", {
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": lnum.astype("int32"),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100, 2),
        "l_returnflag": [("N", "A", "R")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": sdate.astype("datetime64[us]"),
    })

    # events: increasing ts across 2024-01, event_id in ts order
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    gaps = rng.exponential(30 * 86400e6 / n_ev, n_ev)  # microseconds
    ts = t0 + np.cumsum(gaps).astype("timedelta64[us]")
    _write(out, "events", {
        "event_id": np.arange(n_ev),
        "ts": ts,
        "user_id": rng.integers(0, n_ev_users, n_ev),
        "event_type": [_ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    })

    # documents: 10..100 vocab words; n_chars == len(text)
    nw = rng.integers(10, 101, n_doc)
    widx = rng.integers(0, len(_VOCAB), int(nw.sum()))
    texts, off = [], 0
    for k in nw:
        texts.append(" ".join(_VOCAB[w] for w in widx[off : off + k]))
        off += k
    _write(out, "documents", {
        "doc_id": np.arange(n_doc),
        "text": texts,
        "lang": [_LANGS[i] for i in rng.integers(0, len(_LANGS), n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    })

    # embeddings: 64-dim float32, 10 labels
    emb = (rng.normal(0, 0.15, (n_emb, 64))).astype("float32")
    _write(out, "embeddings", {
        "vec_id": np.arange(n_emb),
        "embedding": list(emb),
        "label": rng.integers(0, 10, n_emb).astype("int32"),
    })
    print(f"wrote sf={sf} corpus to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
