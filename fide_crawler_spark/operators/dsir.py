"""DSIR — data selection with hashed n-gram importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") selects pretraining documents whose hashed n-gram feature
distribution looks like a small target corpus rather than the raw
crawl: every unigram/bigram is hashed into one of B buckets, bucket
distributions p (target) and q (raw) are estimated with add-k
smoothing, and each document is scored by its mean log importance
ratio log(p_b/q_b) over its features.

Spark-first design (100 TB shape):
- The feature stream is one codegen'd projection (split → unigram ∪
  bigram grams via higher-order functions → 8-byte hash → ``% B``);
  raw text never rides a shuffle.
- Both distribution tables are ≤ B rows by construction (default
  4096): estimated with ONE grouped aggregate over the bucket ids
  (map-side partial combine; the target count is a conditional sum in
  the same pass, not a second scan), and broadcast back onto the
  feature stream for scoring.
- Per-document scores are exact integer arithmetic: each bucket's log
  ratio is snapped to a scaled BIGINT (``floor(lr*1e9+0.5)``) before
  the per-doc sum, so results are partition-order independent and
  bit-identical in the DuckDB oracle (via the md5h hash bridge when
  ``portable=True``).

The reference crawler has no selection stage — it fetches every
frontier URL (main.py loop); this is the curation-side counterpart
the 100 TB pipeline needs before training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fide_crawler_spark.operators.dedup import _feature_hash

LOG_SCALE = 1_000_000_000


def _gram_arr(toks: Column) -> Column:
    """Unigrams ∪ space-joined bigrams of a MATERIALIZED token-array
    attribute — built JVM-side; the <2-token case is gated
    (``sequence(1, stop)`` counts DOWN when stop < 1).

    ``toks`` must be an attribute reference, not a ``split(...)``
    expression: HOF lambdas are CodegenFallback (interpreted, no
    common-subexpression elimination), so a split captured in the
    bigram ``element_at`` lambda re-splits the document once PER
    BIGRAM — O(tokens²) per doc (measured 3.73 → 1.54 s isolated on
    the sf0.1 q78 surface from hoisting it)."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def dsir_weights(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    n_buckets: int = 4096,
    add_k: float = 1.0,
    portable: bool = False,
) -> DataFrame:
    """Per-document DSIR importance score.

    ``target`` is a boolean Column over ``docs`` marking the target
    domain (e.g. ``F.col("source") == "src0"``).  Returns
    (doc_id, is_target, n_feats, avg_lr) where avg_lr is the mean
    scaled log importance ratio, floor-rounded to 4 decimals; rank by
    avg_lr desc to select.  The raw distribution q is the FULL corpus
    (target included), as in the paper.
    """
    feats = docs.select(
        F.col(doc_id_col),
        target.cast("int").alias("is_target"),
        F.split(F.col(text_col), " ").alias("__tk"),
    ).select(
        F.col(doc_id_col),
        "is_target",
        F.explode(_gram_arr(F.col("__tk"))).alias("g"),
    ).select(
        doc_id_col,
        "is_target",
        # pmod, not %: Spark's % keeps the dividend's sign, so the
        # xxhash64 (portable=False) path would scatter features over
        # (-B, B) — ~2B-1 buckets — mis-normalizing the add-k smoothing
        # (ADVICE r5).  md5h is non-negative, so the oracled
        # portable=True path is unchanged.
        F.pmod(_feature_hash(F.col("g"), portable), F.lit(n_buckets)).alias("b"),
    )
    # one pass: per-bucket raw count + conditional target count
    cnts = feats.groupBy("b").agg(
        F.count("*").alias("c"),
        F.sum("is_target").alias("t"),
    ).persist()
    tot = cnts.agg(
        F.sum("c").alias("tc"), F.sum("t").alias("tt")
    ).collect()[0]
    total_c, total_t = int(tot["tc"]), int(tot["tt"])

    kb = add_k * n_buckets
    lr = cnts.select(
        "b",
        F.floor(
            F.log(
                ((F.col("t").cast("double") + F.lit(add_k))
                 / F.lit(float(total_t) + kb))
                / ((F.col("c").cast("double") + F.lit(add_k))
                   / F.lit(float(total_c) + kb))
            )
            * F.lit(float(LOG_SCALE))
            + F.lit(0.5)
        ).cast("bigint").alias("lr"),
    )

    agg = (
        feats.join(F.broadcast(lr), "b")
        .groupBy(doc_id_col)
        .agg(
            F.max("is_target").alias("is_target"),
            F.count("*").alias("n_feats"),
            F.sum("lr").alias("s"),
        )
    )
    avg = F.col("s").cast("double") / (
        F.col("n_feats").cast("double") * F.lit(float(LOG_SCALE))
    )
    return agg.select(
        doc_id_col,
        "is_target",
        "n_feats",
        (F.floor(avg * 10000 + F.lit(0.5)) / 10000).alias("avg_lr"),
    )
