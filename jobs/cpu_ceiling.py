#!/usr/bin/env python
"""Pinned Spark-free host-ceiling probe (invoked by bench.py).

The N→4N scaling criterion is measured on a shared VM whose own
parallel throughput ratio moves hour to hour (hypervisor behavior,
frequency scaling, memory bandwidth); an engine cannot scale better
than the host it runs on.  This probe runs the SAME pinned-core
protocol as the crawl pair on the crawl's OWN dominant kernel — the
synthetic page render + parse at bench page weight, imported from
``fixtures`` (pure Python, no Spark) and fanned out with plain
``multiprocessing`` — and prints the wall time.

Round-5 change: earlier rounds probed with a single-thread-BLAS matmul
+ bytes scan.  Measured side by side, that cache-resident kernel
scales 1→4 at ~0.97 and 2→8 at ~0.76-0.92 on this VM while the actual
allocation-heavy fetch kernel scales at ~0.88-0.90 on BOTH pairs — the
matmul probe was an optimistic ceiling for the workload the bench
actually runs, making ``efficiency_vs_host_ceiling`` look artificially
low on quiet hours and bounce on noisy ones.  Probing with the real
kernel makes the ceiling the workload's own hardware envelope.

Prints one JSON line: {"cores": N, "sec": t}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGE_WEIGHT = int(os.environ.get("BENCH_PAGE_WEIGHT", "32"))
URLS_PER_TASK = 20


def work(task_i: int) -> int:
    from fide_crawler_spark.fixtures import calc_url, parse_page, render_page

    n = 0
    for j in range(URLS_PER_TASK):
        i = task_i * URLS_PER_TASK + j
        u = calc_url(str(1000000 + i % 1200), f"20{18 + i % 7}-{1 + i % 12:02d}-01")
        n += len(parse_page(render_page(u, PAGE_WEIGHT)))
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--tasks", type=int, default=64)
    args = ap.parse_args()
    os.sched_setaffinity(0, set(range(args.cores)))
    with mp.Pool(args.cores) as p:
        p.map(work, range(args.cores))  # warm the pool + imports
        t0 = time.time()
        p.map(work, range(args.tasks))
        dt = time.time() - t0
    print(json.dumps({"cores": args.cores, "sec": round(dt, 3)}))


if __name__ == "__main__":
    main()
