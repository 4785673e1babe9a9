"""Bucketed-table layout for co-located url_hash joins.

SCALE.md's frontier story says big frontier⋈seen joins should be
bucketed by ``url_hash`` so the URL-seen anti-join and MERGE-style
upserts never shuffle either side.  This module is that path made
concrete: write once bucketed, then every equi-join on the bucket key
plans as a zero-Exchange SortMergeJoin over pre-sorted bucket files
(``Bucketed: true`` in the scan, pinned by tests/test_plans.py).

On a real cluster this is Spark's native bucketing over the warehouse;
Iceberg's ``bucket(N, url_hash)`` partition transform is the drop-in
equivalent for the SnapshotTable backend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str] = "url_hash",
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.
    ``key`` may be a composite (e.g. ``["band_id", "band_hash"]`` for
    the dedup index) — joins on exactly those keys then reuse the
    bucketing with zero Exchange on this side."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.mode("overwrite").saveAsTable(table)


def colocated_anti_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url_hash"
) -> DataFrame:
    """URL-seen anti-join over two tables bucketed on ``key``: with
    matching bucket counts neither side shuffles — the join reads
    bucket i against bucket i."""
    return spark.table(left_table).join(spark.table(right_table), key, "left_anti")
