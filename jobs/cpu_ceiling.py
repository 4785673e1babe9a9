#!/usr/bin/env python
"""Pinned pure-CPU host-ceiling probe (invoked by bench.py).

The N→4N scaling criterion is measured on a shared VM whose own
parallel throughput ratio moves day to day (hypervisor steal, memory
bandwidth); an engine cannot scale better than the host it runs on.
This probe runs the SAME pinned-core protocol as the crawl pair on a
Spark-free CPU workload (single-thread BLAS matmul + bytes scan — the
numeric/string mix of the fetch+parse stage) and prints the wall time,
giving every bench artifact a same-day hardware baseline to normalize
against.

Prints one JSON line: {"cores": N, "sec": t}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

# must be set before numpy import in the workers (fork inherits env)
for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[var] = "1"


def work(_i: int) -> float:
    import numpy as np

    rng = np.random.default_rng(1)
    a = rng.standard_normal((400, 400))
    s = 0.0
    for _ in range(12):
        s += float((a @ a).sum())
        b = ("x" * 65536).encode()
        s += sum(b[::257])
    return s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--tasks", type=int, default=64)
    args = ap.parse_args()
    os.sched_setaffinity(0, set(range(args.cores)))
    with mp.Pool(args.cores) as p:
        p.map(work, range(args.cores))  # warm the pool
        t0 = time.time()
        p.map(work, range(args.tasks))
        dt = time.time() - t0
    print(json.dumps({"cores": args.cores, "sec": round(dt, 3)}))


if __name__ == "__main__":
    main()
