"""Exactly-once commit protocol for foreachBatch state directories.

Structured Streaming's foreachBatch is at-least-once: a crashed batch
is replayed with the same ``batch_id``.  Every stateful processor here
(incremental dedup, streaming curation) therefore follows one
discipline:

1. each batch writes its outputs into per-batch ``batch_id=<n>``
   partition directories with ``mode=overwrite`` (a half-written crashed
   attempt is replaced wholesale on replay);
2. AFTER all writes succeed, a JSON commit marker is atomically renamed
   into ``_commits/``;
3. readers filter state tables to COMMITTED batch ids only (partition
   pruning — uncommitted leftovers are never scanned);
4. a replay of a fully committed batch is a no-op.

At cluster scale the markers are snapshot properties on Iceberg
appends; the single-host form is a marker file per batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column
from pyspark.sql import functions as F


def committed_ids(commits_dir: str) -> list[int]:
    """Sorted batch ids holding a published commit marker."""
    if not os.path.isdir(commits_dir):
        return []
    return sorted(
        int(f[len("batch-"):-len(".json")])
        for f in os.listdir(commits_dir)
        if f.startswith("batch-") and f.endswith(".json")
    )


def committed_filter(committed: list[int], batch_id: int) -> Column:
    """Partition filter selecting committed state.  Under the stream's
    serialized foreachBatch the committed set is a contiguous prefix of
    batch ids, so the usual predicate is a constant-size range filter
    (no ever-growing IN-list on an unbounded stream); the explicit id
    list only backs the gap case (manual/out-of-order calls)."""
    if committed == list(range(batch_id)):
        return F.col("batch_id") < batch_id
    return F.col("batch_id").isin(committed)


def marker_path(commits_dir: str, batch_id: int) -> str:
    return os.path.join(commits_dir, f"batch-{batch_id}.json")


def publish_marker(commits_dir: str, batch_id: int, payload: dict) -> None:
    """Atomic write-then-rename AFTER all state writes succeeded."""
    os.makedirs(commits_dir, exist_ok=True)
    marker = marker_path(commits_dir, batch_id)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"batch_id": batch_id, **payload}, fh)
    os.replace(tmp, marker)


def read_markers(commits_dir: str, ids: list[int]) -> list[dict]:
    out = []
    for i in ids:
        with open(marker_path(commits_dir, i)) as fh:
            out.append(json.load(fh))
    return out
