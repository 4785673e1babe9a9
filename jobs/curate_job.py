#!/usr/bin/env python
"""spark-submit entry point for the training-data curation pipeline.

Runs the full curation chain over a documents parquet table and WRITES
real artifacts (not just a query result):

    quality filter → exact dedup → leakage-free group split →
    chunking → token-budget shard packing →
    <out>/shards/  (chunk rows partitioned by shard_id)
    <out>/vocab/   (frequency-ranked vocabulary)
    <out>/sequences/ (optional --seq-len: concat-and-chop fixed-length
                     training-sequence piece manifest)
    <out>/stats.json (one-line corpus accounting)

Example:
    spark-submit --master local[32] --py-files /tmp/fide_crawler_spark.zip \
        jobs/curate_job.py --input /root/testdata/sf0.1/documents.parquet \
        --out /tmp/curated --min-quality 0.55 --holdout 0.25 \
        --chunk-tokens 64 --overlap 8 --shard-tokens 4096

The shard write is ``partitionBy(shard_id)`` so each training shard is
one directory of parquet files — the layout a data-loader consumes
directly.  Every stage is deterministic (hash-keyed split, total-order
packing), so re-running the job reproduces byte-identical shards.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=float, default=0.55)
    ap.add_argument(
        "--weighted-rate", type=float, default=None,
        help="replace the hard --min-quality cliff with probabilistic "
        "quality curation: keep each doc with P=min(1, rate*q/mean(q)) "
        "(sampling.weighted_sample — deterministic md5h60 membership)",
    )
    ap.add_argument("--holdout", type=float, default=0.25)
    ap.add_argument("--chunk-tokens", type=int, default=64)
    ap.add_argument("--overlap", type=int, default=8)
    ap.add_argument("--shard-tokens", type=int, default=4096)
    ap.add_argument("--vocab-size", type=int, default=1000)
    ap.add_argument(
        "--seq-len", type=int, default=None,
        help="also write <out>/sequences/: the concat-and-chop "
        "fixed-length training-sequence piece manifest "
        "(shards.pack_sequences) over the same chunk order",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators import chunker as CH
    from fide_crawler_spark.operators import dedup as D
    from fide_crawler_spark.operators import sampling as SA
    from fide_crawler_spark.operators import shards as SH
    from fide_crawler_spark.operators import textstats as TS
    from fide_crawler_spark.operators import tokenize as TK

    spark = SparkSession.builder.appName("fide_crawler_spark.curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    scored = TS.quality_score(docs)
    if args.weighted_rate is not None:
        picked = SA.weighted_sample(
            scored, "quality_score", args.weighted_rate
        ).select("doc_id")
    else:
        picked = scored.filter(
            F.col("quality_score") >= args.min_quality
        ).select("doc_id")
    kept = docs.join(picked, "doc_id", "left_semi")
    deduped = kept.join(
        D.exact_dedup(kept).select("doc_id"), "doc_id", "left_semi"
    )
    split = SA.group_split(deduped, args.holdout)
    train = split.filter(F.col("split") == "train")
    n_train = train.count()

    chunks = CH.chunk_documents(
        train, chunk_tokens=args.chunk_tokens, overlap=args.overlap
    )
    packed = SH.pack_shards(
        chunks.select("doc_id", "chunk_id", "n_tokens", "chunk_text"),
        "n_tokens",
        args.shard_tokens,
        [F.col("doc_id").asc(), F.col("chunk_id").asc()],
        # --seq-len reuses this layout's exact offsets (same global
        # token axis) — no second two-pass sort over the chunks
        offset_col="__off" if args.seq_len is not None else None,
    )
    packed.drop("__off").write.mode("overwrite").partitionBy(
        "shard_id"
    ).parquet(f"{args.out}/shards")

    vocab = TK.build_vocab(train, vocab_size=args.vocab_size)
    vocab.write.mode("overwrite").parquet(f"{args.out}/vocab")

    seq_stats = {}
    if args.seq_len is not None:
        seqs = SH.sequence_pieces(
            packed.select("doc_id", "chunk_id", "n_tokens", "__off"),
            "n_tokens",
            args.seq_len,
            "__off",
            id_cols=["doc_id", "chunk_id"],
        )
        seqs.write.mode("overwrite").parquet(f"{args.out}/sequences")
        w = spark.read.parquet(f"{args.out}/sequences")
        seq_stats = {
            "sequences": w.select("seq_id").distinct().count(),
            "seq_pieces": w.count(),
        }

    written = spark.read.parquet(f"{args.out}/shards")
    stats = {
        "docs_in": n_in,
        "docs_train": n_train,
        "chunks": written.count(),
        "tokens": written.agg(F.sum("n_tokens")).first()[0],
        "shards": written.select("shard_id").distinct().count(),
        "vocab_terms": spark.read.parquet(f"{args.out}/vocab").count(),
        **seq_stats,
        "sec": round(time.time() - t0, 2),
    }
    with open(f"{args.out}/stats.json", "w") as f:
        json.dump(stats, f)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
