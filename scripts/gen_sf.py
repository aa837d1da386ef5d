"""Generate a synthetic star-schema fixture at an arbitrary scale factor,
mirroring the driver-generated /root/testdata recipe (TESTDATA.md: TPC-H-ish
tables + events/documents/embeddings, seed 42).

Purpose: scale-curve evidence ABOVE the driver's sf0.1 ceiling (VERDICT r10
item 1) — the distributions below were measured from /root/testdata/sf0.1
(cardinality ratios, value ranges, category frequencies, text vocabulary,
dup rate) so a query's wall-time at gen-sf1 vs sf0.1 isolates the SCALING
exponent, not a data-shape change. NOT a byte-for-byte reproduction of the
driver's generator: correctness gates keep running on the driver's parquet;
this data is for timing only.

Usage: python scripts/gen_sf.py <sf> <out_dir>   (e.g. 1 scratch/sf1)

Measured sf0.1 recipe (duckdb, round 11):
  lineitem 600k rows = sf*6M: orderkey uniform over orders, ~4.07 lines/order
    (1 + Poisson(3.07) capped 17), partkey/suppkey uniform, quantity U{1..50},
    extendedprice U(900, 105k), discount U(0,0.1), tax U(0,0.08),
    returnflag A/N/R uniform, linestatus F/O uniform, shipdate U(1995, 2001-11)
  orders = sf*1.5M, custkey uniform, status F/O/P, 5 priorities, totalprice
    U(1k, 500k), orderdate U(1995, 2001-08)
  customer = sf*150k, 25 nations, acctbal U(-1k, 10k), 5 mktsegments
  supplier = sf*10k; part = sf*200k (25 brands, 6 types, 8x8 adj-noun names,
    size U{1..50}, retailprice U(900, 1000))
  events = sf*1M: users = sf*15k (uniform activity), ts U over 30 days of
    2024-01, 5 types uniform, value Exp(mean 50) truncated ~560,
    props = {"k": U{0..99}}
  documents = sf*50k: 10-100 words from the 31-token spark-ish vocab,
    ~0.3% exact-duplicate rows, langs en 41% / de,es,fr,zh ~15%, 20 sources
  embeddings = sf*20k: 64-dim unit-normalized float32, 10 labels
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
assert len(VOCAB) == 31

ADJ = ["large", "hot", "blue", "old", "cold", "new", "dark", "light"]
NOUN = ["ring", "bolt", "plate", "screw", "wheel", "gear", "cap", "rod"]
TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(lo_days_from_epoch: int, span_days: float, u: np.ndarray):
    us = (lo_days_from_epoch * DAY_US + (u * span_days * DAY_US)).astype(
        "int64"
    )
    return pa.array(us, pa.timestamp("us"))


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(sf * 150_000)
    n_supp = int(sf * 10_000)
    n_part = int(sf * 200_000)
    n_ord = int(sf * 1_500_000)
    n_ev = int(sf * 1_000_000)
    n_users = int(sf * 15_000)
    n_doc = int(sf * 50_000)
    n_emb = int(sf * 20_000)

    # epoch-day anchors (UTC): 1995-01-01 and 2024-01-01
    d1995 = 9131
    d2024 = 19723

    rng = np.random.default_rng(42)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part),
                            rng.integers(0, 8, n_part))
        ],
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us(d1995, 2404, rng.random(n_ord)),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: 1 + Poisson(3.07) lines per order, capped at 17
    lines = np.minimum(1 + rng.poisson(3.07, n_ord), 17)
    lkey = np.repeat(np.arange(n_ord, dtype="int64"), lines)
    n_li = lkey.size
    lno = np.concatenate([np.arange(1, c + 1) for c in lines]).astype("int32")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lno, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(d1995, 2500, rng.random(n_li)),
    }))

    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_us(d2024, 30, np.sort(rng.random(n_ev))),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(
            np.minimum(rng.exponential(50.0, n_ev), 560.0), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: bag-of-words; ~0.3% of rows copy a previous doc verbatim
    vocab = np.array(VOCAB)
    n_words = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.003:
            texts.append(texts[rng.integers(0, i)])
        else:
            texts.append(
                " ".join(vocab[rng.integers(0, 31, n_words[i])]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.normal(0, 1, (n_emb, 64)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    print(f"generating sf={sf} into {out}")
    generate(sf, out)
