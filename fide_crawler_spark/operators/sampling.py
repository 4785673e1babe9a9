"""Deterministic corpus sampling — reproducible across runs and engines.

Curation pipelines need samples that are (a) stable under re-execution
and partitioning (no RNG, no sample() seed dependence on task layout),
and (b) auditable — membership decidable per row from its key alone:

* ``hash_sample``: keep rows whose md5(key‖salt) prefix falls under a
  rate-derived hex threshold.  Pure filter — no shuffle at all.
* ``stratified_sample``: exactly ``k`` rows per stratum, chosen by
  md5 order — the hash acts as a deterministic shuffle.  Implemented on
  `rank.grouped_topk` (range-partitioned two-pass), so a hot stratum
  never serializes into one task the way a row_number window would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_threshold_hex(rate: float, digits: int = 8) -> str:
    """Hex threshold such that P[md5-prefix < threshold] ≈ rate —
    inline the SAME literal into any SQL oracle for bit-equal samples.
    Only meaningful for rate < 1.0: at rate=1.0 the value 16^digits
    does not fit in ``digits`` hex chars (hash_sample special-cases it).
    """
    assert 0.0 <= rate < 1.0, "threshold undefined at rate >= 1.0"
    return format(int(rate * (16 ** digits)), f"0{digits}x")


def hash_sample(
    docs: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic ~rate sample: md5(key‖salt) 8-hex-digit prefix
    compared lexicographically against the rate threshold.  Changing
    ``salt`` draws an independent sample; the same salt always returns
    the same rows.  rate >= 1.0 keeps every row (the 9-hex-digit
    threshold '100000000' would otherwise compare lexicographically
    below most 8-digit prefixes and silently keep ~1/16 of rows)."""
    assert rate >= 0.0
    if rate >= 1.0:
        return docs
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return docs.filter(
        F.substring(h, 1, 8) < sample_threshold_hex(rate)
    )


def stratified_sample(
    docs: DataFrame, strata_col: str, k: int, key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, in deterministic
    md5-of-key order (ties broken by the key itself — a total order, so
    any parallelism yields the same sample)."""
    from fide_crawler_spark.operators.rank import grouped_topk

    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    with_h = docs.withColumn("__h", h)
    out = grouped_topk(
        with_h, [strata_col],
        [F.col("__h").asc(), F.col(key_col).asc()], k,
    )
    return out.drop("__h")


def mixture_sample(
    docs: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Token-budget mixture resampling — the "data mixture" step of a
    training run: sample each source at the rate that makes its
    EXPECTED token contribution ``targets[source] × budget_tokens``
    (clamped at keep-everything when a source is too small — upsampling
    is a separate, explicit decision).

    Plan shape: one tiny per-source token-total aggregate broadcast
    back onto the corpus, then a pure filter — the corpus itself never
    shuffles.  Membership is decidable per row from (key, salt, rate):
    keep iff md5h60(key‖salt) < floor(rate·2^60) — the 60-bit integer
    form of ``hash_sample`` (engine-portable, no hex-string compare,
    and rate=1.0 is safe since 2^60 exceeds every 60-bit hash).
    Sources absent from ``targets`` are dropped (rate 0).

    Output: (key, source, n_tokens, rate) for the sampled docs.
    """
    from fide_crawler_spark.operators.dedup import md5h

    assert budget_tokens > 0 and all(w >= 0 for w in targets.values())
    spark = docs.sparkSession
    w = spark.createDataFrame(
        [(s, float(f)) for s, f in sorted(targets.items())],
        f"{source_col} string, __frac double",
    )
    # sources are known driver-side: push an IN literal into the scan so
    # untargeted sources are pruned at the parquet level (row-group
    # stats / partition pruning at scale), not aggregated and dropped.
    tok = docs.filter(F.col(source_col).isin(list(targets))).select(
        key_col,
        source_col,
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    )
    totals = tok.groupBy(source_col).agg(F.sum("n_tokens").alias("__tot"))
    rates = totals.join(w, source_col).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.col("__frac") * float(budget_tokens) / F.col("__tot").cast("double"),
        ).alias("rate"),
    )
    h = md5h(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return (
        tok.join(F.broadcast(rates), source_col)
        .filter(h < F.floor(F.col("rate") * F.lit(float(2**60))).cast("bigint"))
        .select(key_col, source_col, "n_tokens", "rate")
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Quality-weighted deterministic Bernoulli sample:
    P(keep) = min(1, rate · w / mean(w)) — heavier (higher-quality)
    rows oversampled, expected total fraction ≈ ``rate`` (exactly rate
    when no row clamps at 1).  Used by curation pipelines that keep
    "the best half" probabilistically instead of a hard threshold
    (which cliff-edges at the cut score).

    Membership is md5h60(key‖salt) < floor(P·2^60) — decidable per row
    from (key, w, mean) alone, so the sample is stable under any
    partitioning and engine-portable (the mean enters as one broadcast
    aggregate row; the corpus never shuffles).  The mean is computed as
    exact-integer SUM / COUNT — avg() over doubles would be
    partition-order dependent.  Fractional weights (quality scores)
    snap to fixed-point micro-units (×10^6, the textstats/search
    discipline) before summing, so their mean is order-independent
    too; the quantization error (≤5e-7 per row) is the documented
    trade for determinism.

    Output: input columns + keep_rate (the row's clamped P).

    Weights must be non-negative (probabilities scale linearly in w);
    a negative-weight row gets P<0 and is never kept, and a corpus
    whose MEAN went negative would invert every decision — validate
    upstream, the operator adds no checking job.  An all-zero weight
    column (mean 0, w/mean undefined) degrades to a UNIFORM sample at
    ``rate`` — the natural limit, and the guard matters: without it
    0/0 = NaN and ``least(1.0, NaN)`` is 1.0 in Spark (NaN sorts
    greatest), which would silently keep EVERY row.
    """
    assert rate >= 0.0
    from pyspark.sql.types import DoubleType, FloatType, IntegralType

    from fide_crawler_spark.operators.dedup import md5h

    wtype = docs.schema[weight_col].dataType
    fractional = isinstance(wtype, (DoubleType, FloatType))
    if not fractional and not isinstance(wtype, IntegralType):
        # DecimalType etc. would silently floor-truncate through the
        # integral path (same failure class pack_shards rejects)
        raise TypeError(
            f"weighted_sample requires an integral or float/double "
            f"weight column; {weight_col!r} is {wtype.simpleString()} — "
            f"cast explicitly"
        )
    scale = 1_000_000 if fractional else 1
    if fractional:
        # NaN weights are zeroed BEFORE either use (ADVICE r5): a raw
        # NaN silently dropped out of the fixed-point mean (floor(NaN)
        # is null, skipped by SUM) while making its own row's
        # p = least(1.0, NaN) = 1.0 — always kept.  Zero = the
        # negative-weight contract's "never kept" limit.
        w_dbl = F.when(
            F.isnan(F.col(weight_col)), F.lit(0.0)
        ).otherwise(F.col(weight_col).cast("double"))
        w_fixed = F.floor(
            w_dbl * F.lit(float(scale)) + F.lit(0.5)
        ).cast("bigint")
    else:  # exact: no double round-trip for integral weights
        w_dbl = F.col(weight_col).cast("double")
        w_fixed = F.col(weight_col).cast("bigint")
    m = docs.agg(
        F.sum(w_fixed).alias("__s"),
        F.count("*").alias("__c"),
    ).select(
        (
            F.col("__s").cast("double")
            / F.col("__c").cast("double")
            / F.lit(float(scale))
        ).alias("__mean")
    )
    p = F.when(
        F.col("__mean") > 0,
        F.least(
            F.lit(1.0),
            (F.lit(rate) * w_dbl) / F.col("__mean"),
        ),
    ).otherwise(F.lit(min(1.0, rate)))  # zero-mean corpus → uniform
    h = md5h(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return (
        docs.join(F.broadcast(m))
        .withColumn("keep_rate", p)
        .filter(h < F.floor(F.col("keep_rate") * F.lit(float(2**60))).cast("bigint"))
        .drop("__mean")
    )


def group_split(
    docs: DataFrame,
    holdout_frac: float,
    group_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Leakage-free train/holdout split: the WHOLE group (domain,
    source, dedup cluster) lands on one side, decided by its key hash —
    near-duplicate documents within a group can never straddle the
    split.  Zero shuffle: one codegen'd expression per row.

    Adds ``split`` ∈ {'train','holdout'}; expected holdout mass ≈
    ``holdout_frac`` of GROUPS (not rows — by design: group-level
    assignment is the leakage guarantee)."""
    from fide_crawler_spark.operators.dedup import md5h

    assert 0.0 <= holdout_frac <= 1.0
    h = md5h(F.concat(F.col(group_col).cast("string"), F.lit(salt)))
    thr = F.floor(F.lit(holdout_frac) * F.lit(float(2**60))).cast("bigint")
    return docs.withColumn(
        "split", F.when(h < thr, "holdout").otherwise("train")
    )


def deterministic_shuffle(
    docs: DataFrame, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Global deterministic training-order shuffle: rows permuted by
    md5h(key‖salt) — the same order on every run, engine, and
    parallelism (training-data pipelines need reshufflable-but-
    reproducible epoch order; changing ``salt`` draws an independent
    permutation, e.g. one per epoch).

    Adds ``shuffle_pos`` (1-based).  Scale shape: a range-partitioned
    sort on the 60-bit hash plus the two-pass global rank
    (rank.grouped_rank with no groups) — NO row_number window, which
    would serialize the whole corpus into one task.  The unique
    ``key_col`` tie-break makes the permutation total, so output is
    byte-stable under any partitioning.
    """
    from fide_crawler_spark.operators.dedup import md5h
    from fide_crawler_spark.operators.rank import grouped_rank

    h = md5h(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    ranked = grouped_rank(
        docs.withColumn("__sh", h),
        [],
        [F.col("__sh").asc(), F.col(key_col).asc()],
        rank_col="shuffle_pos",
    )
    return ranked.drop("__sh")
