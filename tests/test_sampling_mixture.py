"""mixture_sample / group_split vs pure-Python md5 references."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from fide_crawler_spark.operators import sampling as SA

TWO60 = 2**60


def _md5h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _corpus(spark):
    rows = [
        (i, f"s{i % 4}", " ".join(["w"] * (5 + i % 7))) for i in range(200)
    ]
    return (
        spark.createDataFrame(rows, "doc_id long, source string, text string"),
        rows,
    )


def test_mixture_matches_python_reference(spark):
    docs, rows = _corpus(spark)
    targets, budget = {"s0": 0.6, "s1": 0.4}, 300
    toks = {i: len(t.split(" ")) for i, _, t in rows}
    tot = {
        s: sum(toks[i] for i, src, _ in rows if src == s) for s in ("s0", "s1")
    }
    want = set()
    for i, src, _ in rows:
        if src not in targets:
            continue
        rate = min(1.0, targets[src] * budget / tot[src])
        if _md5h60(str(i)) < math.floor(rate * TWO60):
            want.add(i)
    got = {
        r["doc_id"]
        for r in SA.mixture_sample(docs, targets, budget).collect()
    }
    assert got == want
    assert want  # non-degenerate


def test_mixture_clamps_to_keep_all(spark):
    docs, rows = _corpus(spark)
    # budget far above the corpus: every targeted source keeps all rows
    out = SA.mixture_sample(docs, {"s2": 1.0}, budget_tokens=10**9).collect()
    assert {r["doc_id"] for r in out} == {i for i, s, _ in rows if s == "s2"}
    assert all(r["rate"] == 1.0 for r in out)


def test_mixture_drops_untargeted_sources(spark):
    docs, _ = _corpus(spark)
    out = SA.mixture_sample(docs, {"s3": 0.5}, budget_tokens=100)
    assert out.filter(F.col("source") != "s3").count() == 0


def test_mixture_salt_draws_independent_sample(spark):
    docs, _ = _corpus(spark)
    a = {r["doc_id"] for r in SA.mixture_sample(docs, {"s0": 0.5}, 150).collect()}
    b = {
        r["doc_id"]
        for r in SA.mixture_sample(docs, {"s0": 0.5}, 150, salt="x").collect()
    }
    assert a and b and a != b


def test_group_split_is_leakage_free(spark):
    docs, _ = _corpus(spark)
    out = SA.group_split(docs, 0.5, group_col="source").collect()
    by_group: dict[str, set[str]] = {}
    for r in out:
        by_group.setdefault(r["source"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_group.values())
    # matches the hash rule exactly
    for s, v in by_group.items():
        want = "holdout" if _md5h60(s) < math.floor(0.5 * TWO60) else "train"
        assert v == {want}, s


def test_group_split_boundaries(spark):
    docs, _ = _corpus(spark)
    assert SA.group_split(docs, 0.0).filter("split = 'holdout'").count() == 0
    assert SA.group_split(docs, 1.0).filter("split = 'train'").count() == 0


def test_group_split_expected_fraction(spark):
    groups = spark.createDataFrame(
        [(i, f"g{i}") for i in range(2000)], "doc_id long, source string"
    )
    frac = (
        SA.group_split(groups, 0.3).filter("split = 'holdout'").count() / 2000
    )
    assert 0.25 < frac < 0.35


# ---------------------------------------------------- weighted_sample


def test_weighted_sample_matches_python_reference(spark):
    """P(keep) = min(1, rate·w/mean) with md5h60 membership — replay the
    whole decision in pure Python (exact-integer mean, same clamp)."""
    rows = [(i, 10 + (i * 37) % 90) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars int")
    mean = sum(w for _, w in rows) / len(rows)
    want = {
        i
        for i, w in rows
        if _md5h60(str(i)) < math.floor(min(1.0, 0.5 * w / mean) * TWO60)
    }
    got = {r["doc_id"] for r in SA.weighted_sample(docs, "n_chars", 0.5).collect()}
    assert got == want
    assert 0 < len(want) < len(rows)  # non-degenerate, non-total


def test_weighted_sample_partition_stable(spark):
    rows = [(i, 1 + i % 50) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars int")
    a = {r["doc_id"] for r in SA.weighted_sample(docs, "n_chars", 0.4).collect()}
    b = {
        r["doc_id"]
        for r in SA.weighted_sample(
            docs.repartition(13, "n_chars"), "n_chars", 0.4
        ).collect()
    }
    assert a == b


def test_weighted_sample_oversamples_heavy_rows(spark):
    """Heavier rows keep at a higher rate; the overall fraction tracks
    the target when few rows clamp."""
    rows = [(i, 50 + (i % 2) * 100) for i in range(2000)]  # w ∈ {50, 150}
    docs = spark.createDataFrame(rows, "doc_id long, n_chars int")
    out = SA.weighted_sample(docs, "n_chars", 0.5).collect()
    light = sum(1 for r in out if r["n_chars"] == 50) / 1000
    heavy = sum(1 for r in out if r["n_chars"] == 150) / 1000
    # expected keep rates: 0.5·50/100 = 0.25 and 0.5·150/100 = 0.75
    assert 0.19 < light < 0.31
    assert 0.69 < heavy < 0.81
    assert abs(len(out) / 2000 - 0.5) < 0.05


def test_weighted_sample_rate_clamps_at_one(spark):
    rows = [(i, 1000 if i == 0 else 1) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars int")
    out = {r["doc_id"]: r["keep_rate"] for r in
           SA.weighted_sample(docs, "n_chars", 1.0).collect()}
    assert out[0] == 1.0  # the heavy row always survives, P clamped


def test_weighted_sample_double_weights_fixed_point_mean(spark):
    """Fractional weights (quality scores) snap to micro-units before
    the mean so the decision is partition-order independent; replay
    the exact fixed-point arithmetic in Python."""
    rows = [(i, round(0.05 + (i * 29 % 97) / 100.0, 6)) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, quality double")
    mean = sum(math.floor(w * 1_000_000 + 0.5) for _, w in rows) / 500 / 1_000_000
    want = {
        i
        for i, w in rows
        if _md5h60(str(i)) < math.floor(min(1.0, 0.5 * w / mean) * TWO60)
    }
    got = {
        r["doc_id"]
        for r in SA.weighted_sample(docs, "quality", 0.5).collect()
    }
    assert got == want
    a = got
    b = {
        r["doc_id"]
        for r in SA.weighted_sample(
            docs.repartition(11, "quality"), "quality", 0.5
        ).collect()
    }
    assert a == b


def test_weighted_sample_zero_mean_degrades_to_uniform(spark):
    """All-zero weights: 0/0 is NaN and least(1.0, NaN)=1.0 in Spark
    (NaN sorts greatest) — without the guard every row would be kept.
    The guarded operator degrades to a uniform sample at `rate`."""
    docs = spark.createDataFrame(
        [(i, 0) for i in range(400)], "doc_id long, n_chars int"
    )
    out = SA.weighted_sample(docs, "n_chars", 0.25).collect()
    want = {
        i for i in range(400)
        if _md5h60(str(i)) < math.floor(0.25 * TWO60)
    }
    assert {r["doc_id"] for r in out} == want
    assert 0 < len(want) < 400
    assert all(r["keep_rate"] == 0.25 for r in out)


def test_weighted_sample_rejects_decimal_weights(spark):
    from decimal import Decimal

    docs = spark.createDataFrame(
        [(1, Decimal("0.5000"))], "doc_id long, score decimal(10,4)"
    )
    with pytest.raises(TypeError, match="integral or float/double"):
        SA.weighted_sample(docs, "score", 0.5)


def test_weighted_sample_nan_weight_never_kept(spark):
    """ADVICE r5: a per-row NaN weight made p = least(1.0, NaN) = 1.0
    (NaN sorts greatest) — the row was ALWAYS kept while silently
    dropping out of the fixed-point mean.  NaN now zeroes the weight:
    never kept, mean unchanged vs the zero-weight corpus."""
    rows = [(i, float(i % 7 + 1)) for i in range(200)] + [(999, float("nan"))]
    docs = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = {r["doc_id"] for r in SA.weighted_sample(docs, "w", 0.3).collect()}
    assert 999 not in kept
    zero = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(200)] + [(999, 0.0)],
        ["doc_id", "w"],
    )
    kept_zero = {
        r["doc_id"] for r in SA.weighted_sample(zero, "w", 0.3).collect()
    }
    assert kept == kept_zero
