"""Streaming incremental near-dup dedup ≡ the sequential batch loop.

Micro-batch boundaries ARE semantics for streaming dedup (an
earlier-arriving near-dup dominates later arrivals), so the contract is
stream == the batch-at-a-time loop over the same chunks in the same
order: chunk_i deduped within itself and against the union of all
earlier survivors, via the persisted banded_signatures index.
"""

from __future__ import annotations

import os
import time

from fide_crawler_spark.operators.dedup import incremental_dedup, minhash_dedup
from fide_crawler_spark.streaming.pipeline import start_incremental_dedup_stream


def _doc(i: int, salt: str = "") -> tuple[int, str]:
    toks = " ".join(f"w{i}t{j}{salt}" for j in range(30))
    return (i, toks)


def _near_dup(of: int, new_id: int) -> tuple[int, str]:
    # share 28/30 tokens with the base doc -> jaccard well above 0.8
    toks = [f"w{of}t{j}" for j in range(30)]
    toks[0], toks[1] = f"v{new_id}a", f"v{new_id}b"
    return (new_id, " ".join(toks))


CHUNKS = [
    # batch 0: 0-9 unique, 101 dups 0 within the batch
    [_doc(i) for i in range(10)] + [_near_dup(0, 101)],
    # batch 1: 10-14 unique, 102 dups 3 (cross-batch vs corpus),
    # 103 dups 10 (same batch), 104 dups 101 (a doc that DIDN'T
    # survive -> 104 must survive unless it also matches 0; it shares
    # 28 tokens with 101 which shares 28 with 0 -> vs 0 jaccard ~26/34
    # < 0.8, so 104 survives: domination is not transitive)
    [_doc(i) for i in range(10, 15)]
    + [_near_dup(3, 102), _near_dup(10, 103), _near_dup(101, 104)],
    # batch 2: one fresh doc + one dup of the very first corpus doc
    [_doc(20), _near_dup(7, 105)],
]


def _chunk_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_loop(spark):
    """Sequential reference: per-chunk incremental dedup with an
    accumulating corpus."""
    corpus = None
    survivors_by_batch = []
    for rows in CHUNKS:
        df = _chunk_df(spark, rows)
        if corpus is None:
            surv = minhash_dedup(df, threshold=0.8)
        else:
            surv = incremental_dedup(df, corpus, threshold=0.8)
        ids = sorted(r["doc_id"] for r in surv.select("doc_id").collect())
        survivors_by_batch.append(ids)
        corpus = surv if corpus is None else corpus.unionByName(surv)
        corpus = corpus.localCheckpoint()
    return survivors_by_batch


def test_streaming_incremental_dedup_matches_batch_loop(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "incoming"
    src.mkdir()
    # one SINGLE parquet file per chunk (the file stream source does
    # not recurse into Spark-written directory outputs); mtimes
    # strictly increasing so maxFilesPerTrigger=1 triggers them in
    # arrival order
    now = time.time()
    for i, rows in enumerate(CHUNKS):
        f = str(src / f"chunk{i}.parquet")
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, f)
        os.utime(f, (now + i, now + i))

    state = str(tmp_path / "state")
    q = start_incremental_dedup_stream(
        spark, str(src), state, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(os.path.join(state, "survivors"))
    got = {
        int(r["batch_id"]): sorted(
            x["doc_id"]
            for x in out.filter(out.batch_id == r["batch_id"])
            .select("doc_id")
            .collect()
        )
        for r in out.select("batch_id").distinct().collect()
    }
    want = {i: ids for i, ids in enumerate(_batch_loop(spark))}
    assert got == want

    # corpus state == all survivors; bands index covers every survivor
    corpus_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(state, "corpus")).collect()
    }
    assert corpus_ids == {i for ids in want.values() for i in ids}
    band_docs = {
        r["doc"]
        for r in spark.read.parquet(os.path.join(state, "bands"))
        .select("doc")
        .distinct()
        .collect()
    }
    assert band_docs == corpus_ids


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch runs at-least-once: a replayed batch must not dedup
    against its OWN previous (possibly partial) writes, and a replay of
    a committed batch must be a no-op.  Drives the processor directly
    — same code path the stream uses."""
    import json

    from fide_crawler_spark.streaming.pipeline import (
        make_incremental_dedup_processor,
    )

    state = str(tmp_path / "state")
    proc = make_incremental_dedup_processor(spark, state, threshold=0.8)

    def snapshot():
        out = {}
        for sub in ("corpus", "bands", "survivors"):
            df = spark.read.parquet(os.path.join(state, sub))
            key = "doc" if sub == "bands" else "doc_id"
            out[sub] = sorted(
                (int(r[key]), int(r["batch_id"]))
                for r in df.select(key, "batch_id").collect()
            )
        return out

    b0 = _chunk_df(spark, CHUNKS[0])
    proc(b0, 0)
    after_first = snapshot()
    # replay of the committed batch: exact no-op (marker short-circuit)
    proc(b0, 0)
    assert snapshot() == after_first
    assert {i for i, _ in after_first["corpus"]} == set(range(10))

    # crash-replay: batch 1's FIRST attempt died after writing corpus/
    # but before bands/ + the commit marker.  Simulate by deleting the
    # marker and the bands partition, then replaying — the replay must
    # overwrite the orphaned corpus partition instead of deduping
    # against it (the pre-fix behavior dropped every batch-1 doc).
    b1 = _chunk_df(spark, CHUNKS[1])
    proc(b1, 1)
    committed = snapshot()
    os.remove(os.path.join(state, "_commits", "batch-1.json"))
    import shutil

    shutil.rmtree(os.path.join(state, "bands", "batch_id=1"))
    proc(b1, 1)
    assert snapshot() == committed
    with open(os.path.join(state, "_commits", "batch-1.json")) as fh:
        n_committed = json.load(fh)["survivors"]
    assert n_committed == len(
        [x for x in committed["survivors"] if x[1] == 1]
    )


def test_planted_semantics_in_reference_loop(spark):
    """The planted scenario itself behaves as designed (guards the test
    against a silently-degenerate fixture): within-batch dup, cross-batch
    dup, and dup-of-a-dropped-doc all resolve correctly."""
    b = _batch_loop(spark)
    assert 101 not in b[0] and set(range(10)) <= set(b[0])
    assert 102 not in b[1]          # killed by corpus doc 3
    assert 103 not in b[1]          # killed by same-batch doc 10
    assert 104 in b[1]              # its near-dup 101 never survived
    assert b[2] == [20]             # 105 killed by corpus doc 7
