#!/usr/bin/env python
"""One pinned crawl-throughput run (invoked by bench.py per
parallelism level).

Pins the whole process tree (driver, JVM, Python workers) to the first
``--cores`` CPUs via sched_setaffinity BEFORE the JVM starts, so
``local[N]`` really means N CPUs — in unpinned local mode the Arrow
python workers run on cores outside the executor-thread count, which
silently inflates the small-N measurement and corrupts the N→4N
scaling comparison.

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--seeds", type=int, default=1200)
    ap.add_argument("--start", default="2018-01-01")
    ap.add_argument("--end", default="2024-12-01")
    ap.add_argument("--page-weight", type=int, default=32)
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()

    if not args.no_pin:
        os.sched_setaffinity(0, set(range(args.cores)))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from fide_crawler_spark.operators.frontier import generate_frontier
    from fide_crawler_spark.operators.scheduler import CrawlJob
    from fide_crawler_spark.session import get_spark

    spark = get_spark(f"crawl_bench_{args.cores}", cores=args.cores)
    # Every shuffle in the epoch path is explicitly partitioned (range
    # shuffle pinned by persist in dequeue_rank, fetch repartition(n),
    # salted politeness) — AQE cannot improve those plans, and its
    # per-query re-optimization rounds cost ~0.5-1 s of driver latency
    # per epoch (interleaved A/B, identical output CRC).  AQE stays ON
    # for the analytics tier (session.py default) where it earns it.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    seeds = spark.createDataFrame(
        [(str(1000000 + i), i) for i in range(args.seeds)],
        "fide_id string, seed_pos int",
    )
    frontier = generate_frontier(seeds, args.start, args.end)
    n_urls = frontier.count()
    wd = tempfile.mkdtemp(prefix=f"crawl_bench_{args.cores}_")
    try:
        # budget = half the frontier → two epochs: epoch 1 dequeues with
        # an empty seen set, epoch 2 exercises the steady-state path
        # (Bloom pre-pass + exact anti-join against 50k fetched URLs),
        # so the measured throughput covers the full dequeue pipeline.
        job = CrawlJob(
            spark, wd,
            budget_per_host=(n_urls + 1) // 2,
            page_weight=args.page_weight,
            bloom_bits_per_part=1 << 23,
        )
        job.init(frontier)
        # warm cluster-lifetime state before the clock starts (same
        # rationale as bench.py's query warmup): the Arrow python
        # worker pool, whole-stage codegen, and the parquet committer
        # are per-session costs a long-lived cluster amortizes — and
        # they are core-count-asymmetric (the 4N run pays to spawn 4×
        # the workers inside its measured window otherwise, biasing
        # the scaling ratio it exists to measure)
        # warm the REAL hot path, not a toy: a micro-batch through the
        # fused fetch+parse stage and a nested-span parquet write JITs
        # the Arrow decode, arrays_zip/struct codegen, and the nested
        # column writer — on a cold JVM those first-compile costs
        # otherwise land inside epoch 0's measured window (observed as
        # e0 running ~5-20% over e1 at small N)
        from fide_crawler_spark.operators.parse import fetch_parse_stage

        if n_urls:  # empty frontier → no part files to read back
            warm_batch = frontier.limit(4 * args.cores).selectExpr(
                "url", "xxhash64(url) as url_hash", "fide_id", "period",
                "seed_pos", "retry_count", "cast(0 as long) as rank",
            ).repartition(args.cores)
            fetch_parse_stage(
                warm_batch, weight=args.page_weight
            ).write.mode("overwrite").parquet(os.path.join(wd, "_warm"))
            spark.read.parquet(os.path.join(wd, "_warm")).selectExpr(
                "sum(size(spans))"
            ).collect()
        t0 = time.time()
        epoch_stats = job.run()
        dt = time.time() - t0
        stats = {
            "fetched": sum(s.get("fetched", 0) for s in epoch_stats),
            "epochs": len(epoch_stats),
        }
        # lineage is per-commit — sum across every snapshot's manifest
        n_spans = sum(
            x["spans"]
            for s in job.docs_tbl.snapshots()
            for x in job.docs_tbl.manifest(s)["lineage"]
        )
        checksum = job.docs_tbl.read(spark).selectExpr(
            "sum(crc32(concat_ws('|', doc_id, cast(n_spans as string)))) AS c"
        ).first()["c"]
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "urls": n_urls,
                "fetched": stats["fetched"],
                "spans": n_spans,
                "sec": round(dt, 2),
                "urls_per_sec": round(n_urls / dt, 1),
                "checksum": int(checksum),
            }
        )
    )


if __name__ == "__main__":
    main()
