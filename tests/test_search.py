"""BM25 search vs a pure-Python reference implementation."""

from __future__ import annotations

import math

import pytest

from fide_crawler_spark.operators import search as SE

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick quick quick brown cat"),
    (2, "the dog sleeps"),
    (3, "an unrelated document about sparks and rivers"),
    (4, "fox fox fox fox fox fox fox fox fox fox"),
    (5, "brown dog quick fox"),
]


def _py_bm25(corpus, query, k1=SE.K1, b=SE.B):
    """Reference scores with the same rounding discipline as the op."""
    docs = {i: t.lower().split(" ") for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = sorted(set(query.lower().split()))
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    out = {}
    for i, toks in docs.items():
        parts, hits = 0, 0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfn = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
            parts += math.floor(idf * tfn * 1_000_000 + 0.5)
        if hits:
            out[i] = (hits, math.floor(parts / 100 + 0.5) / 10_000)
    return out


def _docs(spark, corpus=CORPUS):
    return spark.createDataFrame(corpus, "doc_id long, text string")


def test_scores_match_python_reference(spark):
    got = {
        r["doc_id"]: (r["n_hits"], r["score"])
        for r in SE.bm25_topk(_docs(spark), "quick fox", k=10).collect()
    }
    assert got == _py_bm25(CORPUS, "quick fox")


def test_ranking_and_tiebreak(spark):
    rows = SE.bm25_topk(_docs(spark), "quick fox", k=3).collect()
    ref = _py_bm25(CORPUS, "quick fox")
    want = sorted(ref, key=lambda i: (-ref[i][1], -ref[i][0], i))[:3]
    assert [r["doc_id"] for r in rows] == want


def test_only_matching_docs_returned(spark):
    rows = SE.bm25_topk(_docs(spark), "rivers", k=10).collect()
    assert [r["doc_id"] for r in rows] == [3]
    assert rows[0]["n_hits"] == 1


def test_parallelism_invariant(spark):
    base = _docs(spark)
    a = SE.bm25_topk(base.coalesce(1), "quick brown dog", k=10).collect()
    b = SE.bm25_topk(base.repartition(7), "quick brown dog", k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_case_insensitive(spark):
    docs = _docs(spark, [(0, "Fox FOX fox"), (1, "fox")])
    got = {r["doc_id"]: r["n_hits"] for r in SE.bm25_topk(docs, "FoX", k=5).collect()}
    assert got == {0: 1, 1: 1}


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        SE.bm25_topk(_docs(spark), "   ")


def test_inverted_index_counts(spark):
    idx = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in SE.inverted_index(_docs(spark, [(7, "a b a A")])).collect()
    }
    assert idx == {("a", 7): 3, ("b", 7): 1}


def test_topk_plan_takeordered_no_global_sort(spark):
    plan = (
        SE.bm25_topk(_docs(spark), "quick fox", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_rrf_fuse_matches_python(spark):
    docs = _docs(spark)
    leg1 = SE.bm25_topk(docs, "quick fox", k=4).select("doc_id", "score")
    leg2 = SE.bm25_topk(docs, "dog", k=4).select("doc_id", "score")
    got = {
        r["doc_id"]: (r["n_legs"], r["rrf_score"])
        for r in SE.rrf_fuse([(leg1, "score"), (leg2, "score")], k=10).collect()
    }

    def leg_ranks(ref):
        order = sorted(ref, key=lambda i: (-ref[i][1], i))
        return {d: r + 1 for r, d in enumerate(order)}

    r1 = leg_ranks(_py_bm25(CORPUS, "quick fox"))
    r2 = leg_ranks(_py_bm25(CORPUS, "dog"))
    want = {}
    for d in set(r1) | set(r2):
        parts = [
            math.floor(1_000_000_000 / (60 + rk[d]))
            for rk in (r1, r2)
            if d in rk
        ]
        want[d] = (len(parts), math.floor(sum(parts) / 100_000 + 0.5) / 10_000)
    assert got == want


def test_rrf_single_leg_is_rank_order(spark):
    docs = _docs(spark)
    leg = SE.bm25_topk(docs, "quick fox", k=3).select("doc_id", "score")
    rows = SE.rrf_fuse([(leg, "score")], k=3).collect()
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in leg.collect()
    ]
    assert all(r["n_legs"] == 1 for r in rows)


def test_rrf_empty_legs_raises(spark):
    with pytest.raises(ValueError):
        SE.rrf_fuse([])
