#!/usr/bin/env python3
"""Generate a full sf1 test-data set (10x sf0.1) for the scale probe.

Reproduces the driver generator's sf0.1 distributions, measured from
/root/testdata/sf0.1 (see SCALE.md "full-corpus sf1 probe"):

- events    1,000,000 rows: ts sorted-uniform over Jan 2024, user_id
            uniform over N/66.7 users, value ~ Exp(mean 50) rounded to
            2, props = '{"k": <0..99>}'
- documents 50,000 rows: 10-100 tokens uniform from the 31-word
            vocabulary, lang ~ (en .4, de/es/fr/zh .15), source =
            src<doc_id%20>, exact-dup planting at the sf0.1 per-capita
            rate (p=.0032 copy-an-earlier-doc)
- embeddings 20,000 rows: 64-dim unit vectors with a weak label pull
            (avg cosine to own centroid ~= .07, matching sf0.1), 10
            labels
- lineitem  ~6,000,000 rows (1..7 lines per order, avg 4), orders
            1,500,000, customer 150,000 with the observed uniform
            ranges; region/nation/supplier/part copied from sf0.1
            (dimension tables stay joinable at their original keys)

Deterministic: seed 42. Usage:
    python3 tools/gen_sf1.py /tmp/sf1full [/root/testdata/sf0.1]

The output is regenerable probe data — not committed; this script is.
Results: SCALE.md "Round 9: full-corpus sf1 probe".
"""
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1full"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
SCALE = 10

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]

rng = np.random.default_rng(42)


def write(name, table):
    import os
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def gen_events(n=100_000 * SCALE):
    # timestamp[us] WITHOUT timezone, like the current driver tables:
    # Spark reads it as TIMESTAMP_NTZ (Records.eventTsUs has a dedicated
    # arm for it since round 10; the driver switched from timestamp[ns]
    # at the round-9 refresh)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    t1 = np.datetime64("2024-01-31T00:00:00", "us").astype("int64")
    ts = np.sort(rng.integers(t0, t1, n))
    write("events", pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n // 67 + 1, n), pa.int64()),
        "event_type": pa.array(
            np.array(["click", "view", "purchase", "signup", "error"])[
                rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    }))


def gen_documents(n=5_000 * SCALE):
    texts = []
    for i in range(n):
        if i > 0 and rng.random() < 0.0032:  # exact-dup planting
            texts.append(texts[rng.integers(0, i)])
        else:
            k = rng.integers(10, 101)
            texts.append(" ".join(
                VOCAB[j] for j in rng.integers(0, len(VOCAB), k)))
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[
            rng.choice(len(LANGS), n, p=LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def gen_embeddings(n=2_000 * SCALE, dim=64, labels=10):
    cents = rng.normal(size=(labels, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    y = rng.integers(0, labels, n)
    # weak label pull: cos(vec, own centroid) ~= 0.56/|g| ~= .07 (sf0.1)
    vecs = rng.normal(size=(n, dim)) + 0.56 * cents[y]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(y, pa.int32()),
    }))


def gen_orders_lineitem(n_orders=150_000 * SCALE):
    d0 = np.datetime64("1995-01-01", "ns").astype("int64")
    d1 = np.datetime64("2001-08-01", "ns").astype("int64")
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, n_orders // 10, n_orders), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "P", "F"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, n_orders), 2)),
        "o_orderdate": pa.array(
            rng.integers(d0, d1, n_orders), pa.timestamp("ns")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n_orders)]),
    }))
    lines = rng.integers(1, 8, n_orders)  # 1..7 lines/order, avg 4
    n = int(lines.sum())
    okey = np.repeat(np.arange(n_orders), lines)
    lnum = (np.arange(n) - np.repeat(
        np.concatenate(([0], np.cumsum(lines)[:-1])), lines) + 1)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 20000, n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, 1000, n), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(rng.integers(d0, d1, n), pa.timestamp("ns")),
    }))


def gen_customer(n=15_000 * SCALE):
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(0, 10000, n), 2)),
        "c_mktsegment": pa.array(np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"])[rng.integers(0, 5, n)]),
    }))


if __name__ == "__main__":
    import os
    os.makedirs(OUT, exist_ok=True)
    gen_events()
    gen_documents()
    gen_embeddings()
    gen_orders_lineitem()
    gen_customer()
    for dim in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{SRC}/{dim}.parquet", f"{OUT}/{dim}.parquet")
        print(f"{dim}: copied from {SRC}")
