"""Training-shard packing: assign documents to fixed-token-budget shards.

The export step of a training-data pipeline: documents, in a
deterministic total order, are packed into shards of ~``shard_tokens``
tokens (a doc belongs to the shard its cumulative starting offset falls
in — the streaming-writer semantics, so one doc may straddle a
boundary but assignment is exact and order-stable).

Scale shape: the naive form is a GLOBAL running-sum window — one task.
``pack_shards`` instead uses the two-pass layout of `operators/rank.py`:
range-partition by the order key, per-partition token totals (ONE tiny
row per partition to the driver), prefix offsets broadcast back, and a
vectorized cumulative sum per partition.  Shard boundaries are
byte-identical to the window form (pinned in tests) at any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID = "__pid"


def pack_shards(
    docs: DataFrame,
    token_col: str,
    shard_tokens: int,
    order_cols: list[Column],
    shard_col: str = "shard_id",
    num_partitions: int | None = None,
    caches: list | None = None,
    token_offset: int = 0,
    offset_col: str | None = None,
) -> DataFrame:
    """Add ``shard_col`` = (cumulative tokens BEFORE this doc, in the
    total order) div ``shard_tokens``.  ``order_cols`` must be a total
    order (unique tie-break) — order is a data property, so any
    partitioning yields identical shards.  NULL token counts count as 0
    (same as the window form, where SUM skips nulls).

    ``token_offset`` starts the cumulative count at a nonzero value —
    the streaming-continuation hook: a micro-batch packed with the
    total token count of all previously committed batches produces
    shard ids identical to packing the whole corpus at once (the
    running sum is associative; streaming/curation.py carries the
    offset in its commit markers).

    Like `rank.grouped_rank`, the operator persists its sorted layout
    (the two passes must see the same partitioning); pass ``caches`` to
    receive the cached DataFrame and ``unpersist()`` it after consuming
    the result — otherwise it lives until session end.

    ``offset_col`` additionally emits each doc's exact cumulative
    starting token offset (the quantity ``shard_col`` floors) — the
    hook ``pack_sequences`` builds on.
    """
    spark = docs.sparkSession
    # both passes accumulate in int64 (pass 1: int(SUM), pass 2:
    # astype('int64').cumsum()) — a fractional token column would be
    # silently truncated here but summed exactly by the window form,
    # breaking the byte-identity claim, so reject it up front
    tok_type = docs.schema[token_col].dataType.simpleString()
    if tok_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"pack_shards requires an integral token column; "
            f"{token_col!r} is {tok_type} — cast explicitly (floor/round) "
            f"so shard boundaries are well-defined"
        )
    from fide_crawler_spark.operators.rank import adaptive_range_partitions

    p = num_partitions or adaptive_range_partitions(docs)
    sorted_df = (
        docs.withColumn(token_col, F.coalesce(F.col(token_col), F.lit(0)))
        .repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    totals = {
        int(r[_PID]): int(r["t"])
        for r in sorted_df.groupBy(_PID)
        .agg(F.sum(token_col).alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = int(token_offset)
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = sorted_df.drop(_PID).schema.add(shard_col, "long")
    if offset_col:
        out_schema = out_schema.add(offset_col, "long")
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_schema
    )

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = None
        for pdf in batches:
            if not len(pdf):
                continue
            if running is None:
                running = bc.value[int(pdf[_PID].iloc[0])]
            toks = pdf[token_col].astype("int64")
            ends = toks.cumsum() + running
            starts = ends - toks
            running = int(ends.iloc[-1])
            out = pdf.drop(columns=[_PID]).copy()
            out[shard_col] = (starts // shard_tokens).astype("int64")
            if offset_col:
                out[offset_col] = starts.astype("int64")
            yield out

    if caches is not None:
        caches.append(sorted_df)
    return sorted_df.mapInPandas(attach, schema=ddl)


def pack_shards_window(
    docs: DataFrame,
    token_col: str,
    shard_tokens: int,
    order_cols: list[Column],
    shard_col: str = "shard_id",
    token_offset: int = 0,
) -> DataFrame:
    """The single-window reference form (semantic spec; one task — use
    pack_shards at scale)."""
    from pyspark.sql import Window

    docs = docs.withColumn(token_col, F.coalesce(F.col(token_col), F.lit(0)))
    w = Window.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running_before = (
        F.sum(token_col).over(w) - F.col(token_col) + F.lit(int(token_offset))
    )
    return docs.withColumn(
        shard_col, F.floor(running_before / shard_tokens).cast("long")
    )


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    seq_len: int,
    order_cols: list[Column],
    id_cols: list[str] | None = None,
    num_partitions: int | None = None,
    caches: list | None = None,
    token_offset: int = 0,
) -> DataFrame:
    """Concat-and-chop sequence packing — the standard pretraining
    step that turns a token stream into fixed-``seq_len`` training
    rows.  Documents, in the ``order_cols`` total order, are laid
    end-to-end on one global token axis; every ``seq_len`` tokens form
    one training sequence, and a document straddling a boundary is
    SPLIT (each resulting piece is one output row).  Unlike
    ``pack_shards`` (streaming-writer shard assignment: whole doc →
    one shard by starting offset), this emits the exact piece layout a
    tensor writer needs — every sequence except the trailing one is
    exactly ``seq_len`` tokens with zero padding.

    Output: ``id_cols`` (default: all non-token columns) +

    * ``seq_id``     — global sequence index (offset_axis // seq_len)
    * ``seq_pos``    — the piece's first-token position within the
      sequence (0 ≤ seq_pos < seq_len)
    * ``piece_start``— the piece's first-token position within the DOC
    * ``piece_len``  — tokens in this piece (Σ over a doc = its count)

    Scale shape: the only addition over ``pack_shards``'s two-pass
    exact offsets is a JVM ``explode(sequence(...))`` whose fan-out
    per doc is ceil(n/seq_len)+1 pieces — no shuffle, no window; a
    10^12-token corpus at seq_len=8192 emits ~1.2×10^8 rows/TB, each a
    few longs.  Token arrays themselves are NOT moved — downstream
    writers ``slice(token_ids, piece_start+1, piece_len)`` against the
    doc store, keeping this a metadata plan.

    Determinism: offsets are exact integers from the two-pass layout,
    so the piece table is byte-identical under any parallelism (same
    contract as ``pack_shards``, pinned in tests).  ``token_offset``
    is the same streaming-continuation hook.
    """
    if id_cols is None:
        id_cols = [c for c in docs.columns if c != token_col]
    with_off = pack_shards(
        docs,
        token_col,
        seq_len,
        order_cols,
        shard_col="__seq0",
        num_partitions=num_partitions,
        caches=caches,
        token_offset=token_offset,
        offset_col="__off",
    ).drop("__seq0")
    return sequence_pieces(with_off, token_col, seq_len, "__off", id_cols)


def sequence_pieces(
    docs: DataFrame,
    token_col: str,
    seq_len: int,
    off_col: str,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """The pure chop projection behind :func:`pack_sequences`: given
    each doc's exact global starting token offset (``off_col``), emit
    the (seq_id, seq_pos, piece_start, piece_len) piece rows.  Zero
    shuffle — composes with ANY offset provider, so a pipeline that
    already ran ``pack_shards(..., offset_col=...)`` for its shard
    sink derives the sequence manifest for free instead of paying the
    two-pass sorted layout twice (the offsets describe the same global
    token axis regardless of the shard budget)."""
    if id_cols is None:
        id_cols = [c for c in docs.columns if c not in (token_col, off_col)]
    n = F.col(token_col).cast("long")
    off = F.col(off_col).cast("long")
    # sequences touched: floor(off/L) .. floor((off+n-1)/L); empty
    # docs (n=0) still emit one zero-length piece in their home seq
    first = F.floor(off / seq_len).cast("long")
    last = F.floor((off + F.greatest(n - 1, F.lit(0))) / seq_len).cast("long")
    pieces = docs.select(
        *id_cols,
        n.alias("__n"),
        off.alias("__o"),
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    piece_start = F.greatest(
        F.col("seq_id") * seq_len - F.col("__o"), F.lit(0)
    )
    piece_end = F.least(
        (F.col("seq_id") + 1) * seq_len - F.col("__o"), F.col("__n")
    )
    return pieces.select(
        *id_cols,
        F.col("seq_id"),
        F.greatest(
            F.col("__o") - F.col("seq_id") * seq_len, F.lit(0)
        ).alias("seq_pos"),
        piece_start.alias("piece_start"),
        (piece_end - piece_start).alias("piece_len"),
    )
