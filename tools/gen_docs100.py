#!/usr/bin/env python3
"""Generate a 100x (vs sf0.1) documents+embeddings slice for the
pair-family scale probe: 500k documents / 200k embeddings with the SAME
distributions as tools/gen_sf1.py (which itself reproduces the driver's
sf0.1 measured shapes). Pair volume is the only quantity in the repo
that can grow super-linearly in principle, so this is the slice where
the dedup caps are expected to start binding — the probe records where,
and what the dropped-work metrics say at that point (SCALE.md round-11).

Deterministic: seed 42. Usage:
    python3 tools/gen_docs100.py /tmp/sf10docs

Output is regenerable probe data — not committed; this script is.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10docs"
SCALE = 100  # vs sf0.1

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]

rng = np.random.default_rng(42)


def write(name, table):
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


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
    vecs = rng.normal(size=(n, dim)) + 0.56 * cents[y]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(y, pa.int32()),
    }))


if __name__ == "__main__":
    gen_documents()
    gen_embeddings()
