#!/usr/bin/env python3
"""Generate a 100x (vs sf0.1) events slice for the TimeSeries /
stateful-kernel / store-workload scale probe: 10M events with the SAME
distributions as tools/gen_sf1.py's gen_events (which reproduces the
driver's sf0.1 measured shapes). The chunked-window operators cross
their adaptive naive/chunked threshold (~1M rows per event_type) at
this size — per-type counts land at ~2M — so this is the slice where
the two-phase lowerings actually engage, and the probe records their
per-task slice bounds alongside wall time (SCALE.md round-12).

Deterministic: seed 42. Usage:
    python3 tools/gen_events100.py /tmp/sf100ev

Output is regenerable probe data -- not committed; this script is.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100ev"
SCALE = 100  # vs sf0.1

rng = np.random.default_rng(42)


def write(name, table):
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def gen_events(n=100_000 * SCALE):
    # timestamp[us] WITHOUT timezone, like the driver tables (Spark reads
    # TIMESTAMP_NTZ; Records.eventTsUs has a dedicated arm for it)
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


if __name__ == "__main__":
    gen_events()
