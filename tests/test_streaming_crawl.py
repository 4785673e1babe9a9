"""Streaming (foreachBatch) crawl == batch crawl, bit for bit."""

from __future__ import annotations

import json
import os

from fide_crawler_spark.fixtures import seed_frontier_rows
from fide_crawler_spark.operators.scheduler import CrawlJob
from fide_crawler_spark.oracle.sequential import run_oracle
from fide_crawler_spark.streaming.crawl_stream import start_streaming_crawl

SEEDS = ["4040404", "5050505"]
BUDGET = 4


def test_streaming_crawl_matches_batch_and_oracle(spark, tmp_path):
    rows = seed_frontier_rows(SEEDS, "2023-01-01", 4)
    # two seed files → two micro-batches (second arrives after the first
    # has been fully crawled, including overlapping URLs to dedup)
    seed_dir = str(tmp_path / "seeds")
    os.makedirs(seed_dir)
    half = len(rows) // 2
    overlap = rows[half - 2 : half]  # already-crawled URLs re-discovered
    with open(f"{seed_dir}/batch0.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[:half]))
    with open(f"{seed_dir}/batch1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[half:] + overlap))

    job = CrawlJob(spark, str(tmp_path / "wd"), budget_per_host=BUDGET, n_salts=2)
    q = start_streaming_crawl(job, seed_dir, str(tmp_path / "ckpt"), max_files=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    oracle = run_oracle(rows, BUDGET)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in job.read_documents().select("doc_id", "spans").collect()
    }
    assert got == oracle.spans  # same corpus, no dup fetches for overlap
    assert job.pending_count() == 0
    docs = job.docs_tbl.read(spark)
    assert docs.count() == docs.select("doc_id").distinct().count()
