#!/usr/bin/env python3
"""Head-to-head throughput: run the reference implementation (in-core
NumPy path) on the same workloads as graft.Bench's training/inference
entries, so BENCH_r*.json numbers can be compared against a measured
reference baseline on this machine rather than the repo's relative
claims alone.

Workloads (mirroring Bench.scala):
  - train_sf: 6x6 SOM, 10 epochs on the sf embeddings table;
  - train_200k: 8x8 SOM, 3 epochs on 200k x 64 synthetic vectors
    (same deterministic generator: sin(id*i*0.7 + i*1.3), float32);
  - bmu_200k: winner() over the 200k vectors.

Usage: python3 tools/bench_reference.py [sf_dir]
Prints one JSON line: {"reference": {entry: seconds, ...}}
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
from xpysom_dask import XPySom  # noqa: E402


def timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main(sf_dir="/root/testdata/sf0.1"):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    res = {}

    som = XPySom(6, 6, emb.shape[1], random_seed=42)
    som.train(emb, 2)  # warmup (BLAS/thread init)
    res["train_sf_10ep"] = min(
        timeit(lambda: XPySom(6, 6, emb.shape[1], random_seed=42).train(emb, 10))
        for _ in range(2))

    ids = np.arange(200000, dtype=np.float64)[:, None]
    i = np.arange(1, 65, dtype=np.float64)[None, :]
    big = np.sin(ids * i * 0.7 + i * 1.3).astype(np.float32)
    som8 = XPySom(8, 8, 64, random_seed=1)
    som8.train(big[:20000], 1)  # warmup
    res["train_200k_3ep"] = min(
        timeit(lambda: XPySom(8, 8, 64, random_seed=1).train(big, 3))
        for _ in range(2))

    trained = XPySom(8, 8, 64, random_seed=1).train(big, 3)
    res["bmu_200k"] = min(timeit(lambda: trained.winner(big)) for _ in range(2))

    print(json.dumps({"reference": {k: round(v, 3) for k, v in res.items()}}))


if __name__ == "__main__":
    main(*sys.argv[1:])
