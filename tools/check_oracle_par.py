#!/usr/bin/env python3
"""Parallel shard driver for check_oracle.py — big-SF sweeps.

Some oracles (pair-family recursive CTEs) run MINUTES in DuckDB at sf1
while most finish in seconds; a serial sweep serializes behind them.
This shards the query list round-robin by estimated weight over N
worker processes and merges their outputs.

Usage: python3 tools/check_oracle_par.py <sfdir> <outdir> [workers=8]
Writes per-shard logs to <outdir>/_oracle_shard<i>.log and prints the
merged per-query lines + a final "== N ok, M fail" summary.
"""
import json, os, subprocess, sys, time

sf = sys.argv[1]
out = sys.argv[2]
workers = int(sys.argv[3]) if len(sys.argv) > 3 else 8
here = os.path.dirname(os.path.abspath(__file__))

names = sorted(d for d in os.listdir(out)
               if os.path.isdir(os.path.join(out, d)))
# Known-heavy families first so they start immediately; everything else
# round-robins after them.
heavy_kw = ('cluster', 'minhash', 'jaccard', 'simhash', 'dup', 'semantic',
            'tfidf', 'pmi', 'asof', 'bm25')
names.sort(key=lambda n: (0 if any(k in n for k in heavy_kw) else 1, n))
shards = [names[i::workers] for i in range(workers)]

procs = []
t0 = time.time()
for i, shard in enumerate(shards):
    if not shard:
        continue
    log = open(os.path.join(out, f'_oracle_shard{i}.log'), 'w')
    procs.append((i, subprocess.Popen(
        [sys.executable, os.path.join(here, 'check_oracle.py'),
         sf, out, ','.join(shard)],
        stdout=log, stderr=subprocess.STDOUT), log))

ok = fail = 0
for i, p, log in procs:
    rc = p.wait()
    log.close()
    with open(os.path.join(out, f'_oracle_shard{i}.log')) as f:
        for line in f:
            if line.startswith('== '):
                parts = line.split()
                ok += int(parts[1]); fail += int(parts[3])
            else:
                sys.stdout.write(line)
    if rc != 0:
        print(f'shard {i} EXITED rc={rc}'); fail += 1
print(f'== {ok} ok, {fail} fail  ({time.time() - t0:.0f}s, {workers} workers)')
