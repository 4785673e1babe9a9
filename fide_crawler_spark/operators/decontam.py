"""Benchmark decontamination — flag training documents that overlap an
evaluation set.

The standard LLM-pipeline step (n-gram overlap decontamination, as
popularized by the GPT-3 appendix-C / PaLM protocols): a training
document is contaminated if it shares at least ``min_overlap`` word
n-grams with ANY benchmark document.  Beyond the reference (its
closest analog is the seen-URL anti-join, SURVEY C3) but first-class
for the 100 TB corpus use case.

Scale shape: the benchmark shingle set is tiny relative to the corpus
(thousands of eval items vs billions of docs), so it broadcasts; the
corpus side is ONE explode + broadcast semi-join + grouped count — no
all-pairs, no shuffle of the corpus text, and the corpus scan streams.
At very large benchmark sets, drop ``broadcast_benchmark`` and the same
plan runs as a shuffled semi-join on the 8-byte gram hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fide_crawler_spark.operators.dedup import (
    hashed_shingle_docs,
    shingle_docs,
)


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
    hash_grams: bool = True,
) -> DataFrame:
    """Per training doc: ``n_shared`` = number of its distinct word
    n-grams that appear anywhere in the benchmark, and ``contaminated``
    = n_shared ≥ min_overlap.  Every input doc appears in the output
    (zero-overlap docs carry n_shared = 0).

    ``hash_grams=True`` joins on xxhash64(gram) so the shuffle/broadcast
    carries 8-byte keys instead of ~8n-byte strings (collision odds
    2^-64-scale); set False for the oracle-exact string-keyed form.
    """
    # shingles via the split-hoisted helpers (dedup.shingle_docs): the
    # token split runs once per doc, not once per gram, and the hashed
    # form hashes INSIDE the gram transform so distinct/explode/join
    # never touch gram strings
    mk = hashed_shingle_docs if hash_grams else shingle_docs
    doc_grams = mk(docs, n=n, id_col=id_col, text_col=text_col).select(
        F.col("doc").alias("__doc"), F.explode("sh").alias("gram")
    )
    bench_grams = (
        mk(
            benchmark.select(F.lit(0).alias("__bid"), F.col(text_col)),
            n=n, id_col="__bid", text_col=text_col,
        )
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        doc_grams.join(bench_grams, "gram", "left_semi")
        .groupBy("__doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        docs.select(F.col(id_col))
        .join(hits.withColumnRenamed("__doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )
