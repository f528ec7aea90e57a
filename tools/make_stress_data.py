"""Deterministic adversarial stress corpus for the oracle gate.

Generates the same ten tables as ``/root/testdata/sf*`` (schemas are
cloned byte-for-byte from the sf0.001 parquet footers) but with the
degenerate content pockets the synthetic corpus never produces —
exactly the inputs that expose latent cross-engine divergences of the
class ADVICE.md keeps finding one at a time (integer division by a
content-dependent zero, Spark ``div`` truncation vs DuckDB ``//``
flooring on a negative numerator, tie-breaks that depend on partition
order, BIGINT products that only overflow on hot keys):

- documents: empty / whitespace-only / 1-char / 1-token texts, exact-
  duplicate groups, one dominant source (80%), a lang with a single
  doc, high-unicode text, an ``"aaaa..."`` degenerate repetition.
- embeddings: all-zero vectors (cosine norm 0), identical-vector
  groups, one-hot vectors, a label with a single member.
- events: one user owning half the stream, runs of identical
  timestamps (argmax/asof ties), value 0.0 rows, a rare event type,
  negative numbers inside props JSON.
- lineitem/orders: zero quantities and totalprice 0.0, heavy date
  ties, one customer owning most orders, a handful of orphan
  l_orderkey rows (referential-integrity stress for the audits).
- dims: empty-string names, duplicate names, acctbal 0 / negative,
  p_size 0, retailprice ties.

Documented corpus invariants queries legitimately rely on are
PRESERVED: dense 0..N-1 ``doc_id``/``vec_id``, ``n_chars ==
len(text)``, ``event_id`` in timestamp order, timestamps inside the
same 2024 epoch window as the real testdata, all five langs / event
types present.

Everything is closed-form deterministic (no RNG): value = f(row
index) only, so the corpus is identical on every machine.

Usage: python tools/make_stress_data.py [out_dir]   (default
/tmp/stress_sf)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _schema(name: str) -> pa.Schema:
    return pq.read_schema(os.path.join(REF_DIR, f"{name}.parquet"))


# ---------------------------------------------------------------- dims


def gen_region():
    # one empty-string name, one duplicate of another region's name
    names = ["AFRICA", "", "ASIA", "ASIA", "EUROPE"]
    return {"r_regionkey": list(range(5)), "r_name": names}


def gen_nation():
    rows = 25
    keys = list(range(rows))
    # skew: 20 of 25 nations in region 0; one empty name; duplicate names
    names = []
    for i in range(rows):
        if i == 7:
            names.append("")
        elif i in (11, 12):
            names.append("TIED_NATION")
        else:
            names.append(f"NATION_{i:02d}")
    regions = [0 if i < 20 else i - 19 for i in range(rows)]
    return {"n_nationkey": keys, "n_name": names, "n_regionkey": regions}


def gen_customer():
    rows = 80
    keys = list(range(rows))
    names = [f"Customer#{i:09d}" for i in range(rows)]
    nkeys = [0 if i % 10 else i % 25 for i in range(rows)]  # nation skew
    # acctbal: zeros, negatives, heavy ties at 100.0
    bal = []
    for i in range(rows):
        if i % 16 == 0:
            bal.append(0.0)
        elif i % 16 == 1:
            bal.append(-250.5)
        elif i % 4 == 0:
            bal.append(100.0)
        else:
            bal.append(float(i) * 3.25)
    seg = ["BUILDING" if i % 10 else "MACHINERY" for i in range(rows)]
    for i in (3, 13):  # two more segments, thin
        seg[i] = "AUTOMOBILE"
    seg[23] = "FURNITURE"
    return {
        "c_custkey": keys,
        "c_name": names,
        "c_nationkey": nkeys,
        "c_acctbal": bal,
        "c_mktsegment": seg,
    }


def gen_supplier():
    rows = 10
    return {
        "s_suppkey": list(range(rows)),
        # two suppliers share a name; one empty
        "s_name": [
            "" if i == 4 else ("DUP_SUPP" if i in (2, 7) else f"Supplier#{i:04d}")
            for i in range(rows)
        ],
        "s_nationkey": [i % 25 for i in range(rows)],
        "s_acctbal": [(-50.0 if i == 3 else float(i) * 7.5) for i in range(rows)],
    }


def gen_part():
    rows = 20
    return {
        "p_partkey": list(range(rows)),
        "p_name": [f"part {i} stress" for i in range(rows)],
        "p_brand": [f"Brand#{i % 3}" for i in range(rows)],
        # 90% one type (skew for type-grouped aggs)
        "p_type": ["STANDARD BRUSHED" if i % 10 else "PROMO POLISHED" for i in range(rows)],
        "p_size": [0 if i % 7 == 0 else i % 9 for i in range(rows)],  # size 0 pocket
        "p_retailprice": [100.0 if i % 2 else 250.0 for i in range(rows)],  # ties
    }


# ---------------------------------------------------------------- facts

_EPOCH_MS = 1704067200000  # 2024-01-01T00:00:00Z — same window as testdata
_DAY_MS = 86400000


def gen_orders():
    rows = 200
    keys = list(range(rows))
    # one customer owns 60% of orders
    cust = [0 if i % 5 in (0, 1, 2) else i % 80 for i in range(rows)]
    status = ["O" if i % 3 == 0 else ("F" if i % 3 == 1 else "P") for i in range(rows)]
    # totalprice: 0.0 pocket, heavy ties at 1000.0
    price = [
        0.0 if i % 20 == 0 else (1000.0 if i % 3 else float(i) * 11.5)
        for i in range(rows)
    ]
    # date ties: only 8 distinct order dates
    odate = [_EPOCH_MS + (i % 8) * _DAY_MS for i in range(rows)]
    prio = [f"{1 + i % 5}-STRESS" for i in range(rows)]
    return {
        "o_orderkey": keys,
        "o_custkey": cust,
        "o_orderstatus": status,
        "o_totalprice": price,
        "o_orderdate": odate,
        "o_orderpriority": prio,
    }


def gen_lineitem():
    rows = 600
    okey, pkey, skey, lno = [], [], [], []
    qty, ext, disc, tax, rflag, lstat, sdate = [], [], [], [], [], [], []
    for i in range(rows):
        # 3 lines per order; last 12 rows reference ORPHAN orderkeys
        okey.append(i // 3 if i < rows - 12 else 100000 + i)
        pkey.append(i % 20)
        skey.append(i % 10)
        lno.append(i % 3 + 1)
        qty.append(0.0 if i % 25 == 0 else float(i % 50) + 1.0)  # zero-qty pocket
        ext.append(0.0 if i % 40 == 0 else float((i % 100) + 1) * 10.0)
        disc.append(0.0 if i % 2 else 0.1)  # only two discount values (ties)
        tax.append(0.0)
        rflag.append("R" if i % 10 == 0 else ("A" if i % 2 else "N"))
        lstat.append("O" if i % 3 else "F")
        sdate.append(_EPOCH_MS + (i % 6) * _DAY_MS)  # 6 distinct ship dates
    return {
        "l_orderkey": okey,
        "l_partkey": pkey,
        "l_suppkey": skey,
        "l_linenumber": lno,
        "l_quantity": qty,
        "l_extendedprice": ext,
        "l_discount": disc,
        "l_tax": tax,
        "l_returnflag": rflag,
        "l_linestatus": lstat,
        "l_shipdate": sdate,
    }


def gen_events():
    rows = 1000
    types = ["view", "click", "purchase", "signup", "error"]
    ids, ts, uid, etype, val, props = [], [], [], [], [], []
    t = _EPOCH_MS * 1000  # microseconds
    for i in range(rows):
        ids.append(i)
        # runs of identical timestamps: groups of 4 share one µs value
        if i % 4 == 0:
            t += 37_000_000 + (i % 7) * 1_000_000
        ts.append(t)
        uid.append(1 if i % 2 == 0 else (i % 20) + 2)  # user 1 owns half
        # "signup" is rare (3 rows); others cycle
        etype.append("signup" if i in (100, 500, 900) else types[i % 4])
        val.append(0.0 if i % 10 == 0 else round(float(i % 37) * 5.5, 2))
        props.append('{"k": %d}' % ((i % 13) - 3))  # negatives inside JSON
    return {
        "event_id": ids,
        "ts": ts,
        "user_id": uid,
        "event_type": etype,
        "value": val,
        "props": props,
    }


# ---------------------------------------------------------------- text


def gen_documents():
    rows = 300
    langs = ["en", "de", "zh", "fr", "es"]
    sources = ["src0", "src1", "src2"]
    ids, text, lang, src = [], [], [], []
    for i in range(rows):
        ids.append(i)
        if i % 30 == 0:
            t = ""  # empty
        elif i % 30 == 1:
            t = "   "  # whitespace-only
        elif i % 30 == 2:
            t = "x"  # single char
        elif i % 30 == 3:
            t = "word"  # single token
        elif i % 30 == 4:
            t = "a" * 120  # degenerate repetition
        elif i % 30 == 5:
            t = "日本語 テスト ümläut éèê"
        elif i % 30 == 13:
            # vertical tab: the ONE char where Java \s and RE2 \s
            # disagree — tokenizers must use the explicit class
            t = "alpha\x0bbeta gamma\x0b delta"
        elif i % 30 in (6, 7, 8, 9, 10):
            # exact-duplicate group: five ids share one text
            t = "the quick brown fox jumps over the lazy dog " * 3
        elif i % 30 in (11, 12):
            # near-duplicates of the group above (one token differs)
            t = "the quick brown fox leaps over the lazy dog " * 3
        else:
            # ordinary varied text, deterministic by index
            words = [f"tok{(i * 7 + j * 13) % 50}" for j in range(5 + i % 9)]
            t = " ".join(words)
        text.append(t)
        # lang "zh" gets exactly ONE doc; others cycle
        lang.append("zh" if i == 42 else langs[i % 4 if i % 4 < 2 else (i % 4 + 1) % 5])
        src.append("src0" if i % 5 else sources[i % 3])  # src0 dominant (80%)
    n_chars = [len(t) for t in text]
    return {
        "doc_id": ids,
        "text": text,
        "lang": lang,
        "source": src,
        "n_chars": n_chars,
    }


def gen_embeddings():
    rows, dim = 300, 64
    ids, emb, label = [], [], []
    for i in range(rows):
        ids.append(i)
        if i % 25 == 0:
            v = [0.0] * dim  # zero-norm pocket
        elif i % 25 == 1:
            v = [1.0 if j == i % dim else 0.0 for j in range(dim)]  # one-hot
        elif i % 25 in (2, 3, 4):
            v = [0.5] * dim  # identical-vector group
        else:
            v = [
                round(((i * 31 + j * 17) % 200 - 100) / 100.0, 4) for j in range(dim)
            ]
        emb.append(v)
        label.append(9 if i == 77 else i % 9)  # label 9: single member
    return {"vec_id": ids, "embedding": emb, "label": label}


GENERATORS = {
    "region": gen_region,
    "nation": gen_nation,
    "customer": gen_customer,
    "supplier": gen_supplier,
    "part": gen_part,
    "orders": gen_orders,
    "lineitem": gen_lineitem,
    "events": gen_events,
    "documents": gen_documents,
    "embeddings": gen_embeddings,
}

#: millisecond-epoch int columns converted through the cloned
#: timestamp schema field (pa.array handles int->timestamp by unit)
_TS_MS = {"o_orderdate", "l_shipdate"}
_TS_US = {"ts"}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf"
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        schema = _schema(name)
        data = GENERATORS[name]()
        arrays = []
        for field in schema:
            col = data[field.name]
            if field.name in _TS_MS:
                col = pa.array(col, type=pa.timestamp("ms")).cast(field.type)
            elif field.name in _TS_US:
                col = pa.array(col, type=pa.timestamp("us")).cast(field.type)
            else:
                col = pa.array(col, type=field.type)
            arrays.append(col)
        table = pa.Table.from_arrays(arrays, schema=schema)
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"wrote {name}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
