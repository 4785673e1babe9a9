#!/usr/bin/env python
"""Benchmark: headline analytics queries + crawl-throughput scaling.

Per BASELINE.json the authoritative metric is frontier-dequeue→fetch→
span-emit throughput (URLs/sec) with N→4N scaling efficiency ≥ 0.8.
No real cluster exists in this sandbox, so the scaling criterion is
evidenced by running the identical crawl epoch at two local parallelism
levels (local[8] vs local[32]) on the same deterministic input and
reporting throughput at both (BASELINE.md protocol).

Env:
  SPARK_GRAFT_SF_DIR   parquet dir for the query suite (default sf0.1)
  SPARK_GRAFT_CPUS     cores for the query suite (default 32)
  BENCH_CRAWL_SEEDS    frontier size knob (default 2400 players × 84
                       months = 201,600 URLs)
  BENCH_PAGE_WEIGHT    synthetic page weight (default 32 — models a
                       realistic calc-page payload; weight 1 is the
                       tiny test fixture)
  BENCH_SKIP_CRAWL     set to skip the crawl scaling runs (query-only)

Prints ONE JSON line:
  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "crawl": {urls, urls_per_sec_8,
   urls_per_sec_32, scaling_efficiency, ...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fide_crawler_spark.session import get_spark, stop_spark  # noqa: E402

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_SEEDS = int(os.environ.get("BENCH_CRAWL_SEEDS", "2400"))
PAGE_WEIGHT = int(os.environ.get("BENCH_PAGE_WEIGHT", "32"))

# fast, representative subset of the catalog (heavy pairwise ops like
# q24 are correctness-tier, not headline-tier, at sf0.1)
HEADLINE = [
    "flagship_last3_days",
    "q1_pricing_summary",
    "q2_conditional_slices",
    "q5_broadcast_join_revenue",
    "q9_window_dedup_keepfirst",
    "q10_topk_per_group",
    "q13_value_counts_normalized",
    "q18_month_sequence",
    "q19_token_stats",
    "q22_fingerprint",
    "q23_dedup_exact",
    "q25_cosine_topk",
    "q28_tumbling_window",
    "q29_minhash_lsh_candidates",
]


def bench_queries() -> dict[str, float]:
    from fide_crawler_spark.queries import QUERIES

    spark = get_spark("bench_queries", cores=CPUS)
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = QUERIES[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        assert n >= 0
    stop_spark()
    return out


def crawl_run(cores: int) -> dict:
    """One full epoch (dequeue → fused fetch+parse → span snapshot +
    frontier/Bloom commit) over the deterministic synthetic frontier."""
    from fide_crawler_spark.operators.frontier import generate_frontier
    from fide_crawler_spark.operators.scheduler import CrawlJob

    stop_spark()
    spark = get_spark(f"bench_crawl_{cores}", cores=cores)
    seeds = spark.createDataFrame(
        [(str(1000000 + i), i) for i in range(CRAWL_SEEDS)],
        "fide_id string, seed_pos int",
    )
    frontier = generate_frontier(seeds, "2018-01-01", "2024-12-01")
    n_urls = frontier.count()
    wd = tempfile.mkdtemp(prefix=f"bench_crawl_{cores}_")
    try:
        job = CrawlJob(
            spark, wd,
            budget_per_host=10 ** 9,
            page_weight=PAGE_WEIGHT,
            bloom_bits_per_part=1 << 23,
        )
        job.init(frontier)
        t0 = time.time()
        stats = job.run_epoch()
        dt = time.time() - t0
        n_spans = sum(x["spans"] for x in job.docs_tbl.manifest()["lineage"])
        checksum = job.docs_tbl.read(spark).selectExpr(
            "sum(crc32(concat_ws('|', doc_id, cast(n_spans as string)))) AS c"
        ).first()["c"]
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    stop_spark()
    return {
        "cores": cores,
        "urls": n_urls,
        "fetched": stats["fetched"],
        "spans": n_spans,
        "sec": round(dt, 2),
        "urls_per_sec": round(n_urls / dt, 1),
        "checksum": int(checksum),
    }


def main() -> None:
    queries = bench_queries()
    result = {
        "metric": "frontier-dequeue→fetch→span-emit throughput + headline query suite",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
    }
    if not os.environ.get("BENCH_SKIP_CRAWL"):
        r8 = crawl_run(8)
        r32 = crawl_run(32)
        eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
        result["crawl"] = {
            "urls": r8["urls"],
            "page_weight": PAGE_WEIGHT,
            "spans_emitted": r32["spans"],
            "sec_8": r8["sec"],
            "sec_32": r32["sec"],
            "urls_per_sec_8": r8["urls_per_sec"],
            "urls_per_sec_32": r32["urls_per_sec"],
            "scaling_efficiency_8_to_32": round(eff, 3),
            "output_identical": r8["checksum"] == r32["checksum"],
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
