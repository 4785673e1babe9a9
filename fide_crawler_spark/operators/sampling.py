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
