"""Streaming crawl: the epoch loop as a Structured Streaming query.

SURVEY §2.I maps the reference's sequential fetch loop to micro-batch
epochs and notes the two equivalent realizations: a driver loop over
snapshots (operators/scheduler.py — the primary engine, simpler and
exactly-once via manifest commits) and Structured Streaming's
``foreachBatch``.  This module provides the latter so a continuously
fed frontier (e.g. discovered links landing as files/Kafka records)
drives the SAME dequeue→fetch→parse→commit pipeline:

* source: a file stream of seed rows (one micro-batch per file via
  ``maxFilesPerTrigger``);
* ``foreachBatch``: admit the new seeds into the frontier snapshot
  (URL-seen checked against the running Bloom state), then run crawl
  epochs until the new work drains;
* sink: the usual snapshot tables — the streaming query adds no second
  storage path, so batch and streaming crawls are bit-identical
  (tests/test_streaming_crawl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fide_crawler_spark.operators.scheduler import BLOOM_STATE, CrawlJob
from fide_crawler_spark.operators.urlseen import PartitionedBloom, filter_unseen

SEED_SCHEMA = (
    "url string, host string, fide_id string, period string, depth int, "
    "host_rank int, recrawl_age int, seed_pos long, status string, "
    "retry_count int, epoch int"
)


def read_seed_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(SEED_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )


def admit_seeds(job: CrawlJob, seeds: DataFrame) -> int:
    """Admission for a micro-batch of discovered seeds: canonical hash,
    URL-seen check (Bloom pre-pass + anti-join vs the whole frontier —
    streamed seeds CAN duplicate both fetched and pending rows), then a
    frontier append commit."""
    spark = job.spark
    seeds = seeds.withColumn("url_hash", F.xxhash64("url")).dropDuplicates(["url"])
    if job.frontier_tbl.latest() is None:
        job.init(seeds)
        return job.pending_count()
    frontier = job.frontier_tbl.read(spark)
    bloom = PartitionedBloom.from_bytes(job.frontier_tbl.state(BLOOM_STATE))
    fresh = filter_unseen(spark, seeds, frontier, bloom).join(
        frontier.select("url"), "url", "left_anti"
    )
    n_new = fresh.count()
    if n_new == 0:
        return 0
    m = job.frontier_tbl.manifest()["metrics"]
    job.frontier_tbl.commit(
        frontier.unionByName(fresh.select(*frontier.columns)),
        metrics={
            **m,
            "pending": int(m["pending"]) + n_new,
            "total": int(m.get("total", 0)) + n_new,
        },
        state={BLOOM_STATE: job.frontier_tbl.state(BLOOM_STATE)},
    )
    return n_new


def start_streaming_crawl(
    job: CrawlJob, seed_path: str, checkpoint: str, max_files: int = 1
):
    """foreachBatch: admit the micro-batch, crawl until drained."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if admit_seeds(job, batch_df) > 0 or job.pending_count() > 0:
            job.run()

    return (
        read_seed_stream(job.spark, seed_path, max_files)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
