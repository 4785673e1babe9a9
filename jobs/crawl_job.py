#!/usr/bin/env python
"""spark-submit entry point for the crawl scheduler (north rule: the
pipeline launches via ``spark-submit --py-files`` on multi-executor
clusters; see scripts/submit_crawl.sh for the packaging wrapper).

Example:
    spark-submit --master local[32] \
        --py-files /tmp/fide_crawler_spark.zip \
        jobs/crawl_job.py --workdir /tmp/crawl --seeds 100 \
        --start 2023-01-01 --end 2023-12-01 --budget 512

On a real cluster the same invocation takes ``--master yarn|k8s`` and
``--num-executors N`` — the engine contains no local-mode assumptions
(all state lives in the snapshot tables, all order is data).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--start", default="2023-01-01")
    ap.add_argument("--end", default="2023-12-01")
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--max-epochs", type=int, default=1000)
    ap.add_argument("--page-weight", type=int, default=1)
    ap.add_argument("--fetch-mode", default="synthetic")
    ap.add_argument(
        "--retain-snapshots", type=int, default=None,
        help="keep only the newest K (>=2) frontier/doc snapshots per "
        "epoch (Iceberg expire_snapshots; default: unbounded history)",
    )
    ap.add_argument(
        "--compact-docs-every", type=int, default=None,
        help="fold the doc append chain into one file set every N "
        "epochs (Iceberg rewrite_data_files); with retention on, the "
        "following expiry collects the released sets",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fide_crawler_spark.operators.frontier import generate_frontier
    from fide_crawler_spark.operators.scheduler import CrawlJob

    spark = SparkSession.builder.appName("fide_crawler_spark.crawl").getOrCreate()
    # epoch-path shuffles are all explicitly partitioned; AQE's
    # re-optimization rounds only add per-epoch driver latency here
    # (see jobs/crawl_bench.py) — the analytics tier keeps AQE on
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")

    seeds = spark.createDataFrame(
        [(str(1000000 + i), i) for i in range(args.seeds)],
        "fide_id string, seed_pos int",
    )
    frontier = generate_frontier(seeds, args.start, args.end)
    job = CrawlJob(
        spark,
        args.workdir,
        budget_per_host=args.budget,
        page_weight=args.page_weight,
        fetch_mode=args.fetch_mode,
        retain_snapshots=args.retain_snapshots,
        compact_docs_every=args.compact_docs_every,
    )
    job.init(frontier)  # no-op when resuming an existing workdir
    t0 = time.time()
    stats = job.run(max_epochs=args.max_epochs)
    dt = time.time() - t0
    fetched = sum(s.get("fetched", 0) for s in stats)
    print(
        json.dumps(
            {
                "epochs": len(stats),
                "fetched": fetched,
                "sec": round(dt, 2),
                "urls_per_sec": round(fetched / dt, 1) if dt else None,
                "final": stats[-1] if stats else None,
            }
        )
    )


if __name__ == "__main__":
    main()
