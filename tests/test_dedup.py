"""Dedup / similarity correctness against planted ground truth and
pure-numpy oracles (these are the non-SQL-expressible ops the driver
records rows-only; this is their real correctness gate)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from fide_crawler_spark.operators import dedup as D
from fide_crawler_spark.operators import similarity as SIM

VOCAB = (
    "the quick brown fox jumps over lazy dog spark shuffle partition "
    "broadcast join window agg filter scan codegen arrow batch"
).split()


def _mk_docs(spark, n_base=40, n_dups=10, seed=3):
    """n_base random docs + n_dups near-copies (one token changed)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_base):
        toks = [rng.choice(VOCAB) for _ in range(30)]
        rows.append((i, " ".join(toks)))
    for j in range(n_dups):
        base_id, base_text = rows[j]
        toks = base_text.split()
        toks[5] = "mutated"
        rows.append((1000 + j, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _jaccard(a: str, b: str, n=3) -> float:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 1))}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup_counts(spark):
    rows = [(1, "aa bb"), (2, "aa bb"), (3, "cc dd"), (4, "aa bb")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_copies"] for r in D.exact_dedup(df).collect()}
    assert got == {1: 3, 3: 1}


def test_ngram_jaccard_exact_values(spark):
    df, rows = _mk_docs(spark, n_base=15, n_dups=5)
    texts = dict(rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(df, n=3).collect()
    }
    # every computed pair matches the python oracle (rounded 4)
    for (a, b), j in got.items():
        assert abs(j - round(_jaccard(texts[a], texts[b]), 4)) < 1e-9
    # planted near-dups present with high jaccard
    for j in range(5):
        assert got[(j, 1000 + j)] > 0.7


def test_minhash_lsh_finds_planted_dups(spark):
    df, _ = _mk_docs(spark)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates(df, k=16, bands=4).collect()
    }
    found = sum((j, 1000 + j) in cands for j in range(10))
    assert found >= 8, f"LSH recall too low: {found}/10"


def test_minhash_dedup_removes_planted_dups(spark):
    df, _ = _mk_docs(spark)
    survivors = {r["doc_id"] for r in D.minhash_dedup(df, threshold=0.7).collect()}
    # dominated copies (higher ids) mostly removed, all base docs kept
    removed = {1000 + j for j in range(10)} - survivors
    assert len(removed) >= 8
    assert all(i in survivors for i in range(40))


def test_simhash_identical_docs_collide(spark):
    rows = [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"), (3, "zz yy xx ww vv")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc"]: r["simhash"] for r in D.simhash(df).collect()}
    assert sh[1] == sh[2] != sh[3]
    buckets = D.simhash_buckets(df).collect()
    assert len(buckets) == 1 and buckets[0]["docs"] == [1, 2]


def _mk_vectors(n=200, dim=16, n_dups=8, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    dups = base[:n_dups] + rng.standard_normal((n_dups, dim)).astype(np.float32) * 0.01
    ids = list(range(n)) + [5000 + i for i in range(n_dups)]
    vecs = np.vstack([base, dups])
    return ids, vecs


def test_embedding_neardup_finds_planted(spark):
    ids, vecs = _mk_vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in D.embedding_neardup_pairs(df, threshold=0.98, n_planes=6).collect()
    }
    found = sum((i, 5000 + i) in pairs for i in range(8))
    assert found >= 6, f"hyperplane-LSH recall too low: {found}/8"


def test_cosine_topk_matches_numpy(spark):
    ids, vecs = _mk_vectors(n=100, n_dups=0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    q = vecs[0].astype(np.float64)
    unit = vecs.astype(np.float64)
    unit = unit / np.linalg.norm(unit, axis=1, keepdims=True)
    sims = unit @ (q / np.linalg.norm(q))
    expect = sorted(zip(np.round(sims, 4), [-i for i in ids]), reverse=True)[:10]
    expect_ids = [-i for _, i in expect]
    got = [r["vec_id"] for r in SIM.cosine_topk(df, list(q), k=10).collect()]
    assert got == expect_ids


@pytest.mark.parametrize("qidx", [7, 42, 123])
def test_ann_ivf_recall(spark, qidx):
    # three independent query vectors so a broken cell router (e.g.
    # probing the wrong cells for SOME directions) can't pass on luck
    ids, vecs = _mk_vectors(n=300, n_dups=0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[qidx]]
    exact = {r["vec_id"] for r in SIM.cosine_topk(df, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in SIM.ann_topk_ivf(df, q, k=10, n_cells=8, n_probe=3).collect()
    }
    assert len(exact & approx) >= 5, f"IVF recall too low: {exact & approx}"


@pytest.mark.parametrize("threshold", [0.5])
def test_minhash_candidates_are_superset_of_high_jaccard(spark, threshold):
    """LSH guarantee direction: truly-similar pairs should be candidates."""
    df, rows = _mk_docs(spark, n_base=20, n_dups=6)
    texts = dict(rows)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates(df, k=16, bands=8).collect()
    }
    import itertools

    high = {
        (a, b)
        for (a, ta), (b, tb) in itertools.combinations(sorted(texts.items()), 2)
        if _jaccard(ta, tb) >= threshold
    }
    missed = high - cands
    assert len(missed) <= max(1, len(high) // 5), f"missed {missed}"


def test_ngram_jaccard_stop_shingle_pruning(spark):
    """max_doc_freq drops boilerplate shingles: planted dups (unique
    shingles) survive, while a shingle shared by every doc no longer
    generates O(n²) candidate pairs."""
    boiler = "common header boiler plate line"
    rows = [(i, boiler + f" unique{i} token{i} extra{i} word{i}") for i in range(20)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # unpruned: every boilerplate pair is a candidate (20*19/2 + 1)
    full = D.ngram_jaccard_pairs(df, n=3).count()
    assert full >= 190
    pruned = D.ngram_jaccard_pairs(df, n=3, max_doc_freq=5)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pruned.collect()}
    assert (100, 101) in got and got[(100, 101)] == 1.0
    # boilerplate-only pairs gone
    assert all(a == 100 for (a, b) in got), got


def test_hash_sample_is_stable_and_salted(spark):
    from fide_crawler_spark.operators.sampling import hash_sample

    docs = spark.createDataFrame(
        [(i, f"s{i%3}") for i in range(2000)], "doc_id long, source string"
    )
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="x").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="x").collect()}
    c = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="y").collect()}
    assert a == b                      # reproducible
    assert a != c                      # salt draws a different sample
    assert 0.2 < len(a) / 2000 < 0.4   # ≈ rate
    # rate monotonicity: a smaller rate is a subset (same salt)
    small = {r["doc_id"] for r in hash_sample(docs, 0.1, salt="x").collect()}
    assert small <= a


def test_stratified_sample_exact_k_per_stratum(spark):
    from fide_crawler_spark.operators.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, f"s{i%4}") for i in range(400)], "doc_id long, source string"
    )
    out = stratified_sample(docs, "source", 15).collect()
    import collections

    per = collections.Counter(r["source"] for r in out)
    assert per == {f"s{i}": 15 for i in range(4)}
    # determinism across partitionings
    again = stratified_sample(docs.repartition(13), "source", 15).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_hash_sample_rate_boundaries(spark):
    """rate=1.0 keeps EVERY row (regression: the 9-hex-digit threshold
    used to compare below most 8-digit prefixes, silently keeping
    ~1/16 of rows); rate=0.0 keeps none."""
    from fide_crawler_spark.operators.sampling import hash_sample

    docs = spark.createDataFrame(
        [(i, f"s{i%3}") for i in range(2000)], "doc_id long, source string"
    )
    assert hash_sample(docs, 1.0).count() == 2000
    assert hash_sample(docs, 0.0).count() == 0


def test_portable_hash_variants_find_planted_dups(spark):
    """portable=True (md5-keyed, oracle-reproducible) is the same
    algorithm as the xxhash64 default: planted near-dups still found,
    identical docs still collide."""
    df, _ = _mk_docs(spark)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates(df, k=16, bands=4, portable=True).collect()
    }
    assert sum((j, 1000 + j) in cands for j in range(10)) >= 8
    survivors = {
        r["doc_id"]
        for r in D.minhash_dedup(df, threshold=0.7, portable=True).collect()
    }
    assert len({1000 + j for j in range(10)} - survivors) >= 8
    rows = [(1, "aa bb cc"), (2, "aa bb cc"), (3, "zz yy xx")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    b = D.simhash_buckets(sdf, portable=True).collect()
    assert len(b) == 1 and b[0]["docs"] == [1, 2]


def _brute_pairs(ids, vecs, threshold):
    u = vecs.astype(np.float64)
    u = u / np.linalg.norm(u, axis=1, keepdims=True)
    sims = u @ u.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_embedding_neardup_exact_matches_numpy_any_chunking(spark):
    """The chunk grid is exact: every chunking returns the identical
    pair set, equal to the O(n²) numpy oracle."""
    ids, vecs = _mk_vectors(n=80, n_dups=6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    want = _brute_pairs(np.array(ids), vecs, 0.5)
    for chunk_rows in (7, 30, 4096):
        got = {
            (r["vec_a"], r["vec_b"])
            for r in D.embedding_neardup_exact(
                df, threshold=0.5, max_chunk_rows=chunk_rows
            ).collect()
        }
        assert got == want, f"chunk_rows={chunk_rows}"


def test_embedding_neardup_hot_bucket_is_chunked(spark):
    """Pathological corpus: every vector in ONE LSH bucket (identical
    direction).  The chunk grid must (a) still return the exact pair
    set and (b) never feed more than 2×max_chunk_rows — here ≪ n —
    rows to one verify task."""
    n, cap = 120, 16
    base = np.ones(8, dtype=np.float64)
    rows = [(i, [float(x) for x in base * (1.0 + 0.001 * i)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = D.embedding_neardup_pairs(
        df, threshold=0.99, n_planes=8, max_chunk_rows=cap
    )
    got = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    assert len(got) == n * (n - 1) // 2  # collinear → all pairs cosine 1.0
    # structural guarantee: no verify group ever holds the whole bucket
    # — every (bucket, pair_lo, pair_hi) group is ≤ two hash-balanced
    # chunks (loose 4× bound covers hash imbalance), and the grid
    # splits this single bucket into C(8,2)+8 = 36 independent tasks
    bucketed = df.selectExpr(
        "vec_id AS vid", "cast(0 AS bigint) AS bucket",
        "cast(embedding AS array<double>) AS vec",
    )
    grid = D.chunk_grid(bucketed, cap)
    per_group = grid.groupBy("bucket", "pair_lo", "pair_hi").count().collect()
    assert len(per_group) == 36
    assert max(r["count"] for r in per_group) <= 4 * cap


def test_embedding_lsh_pairs_subset_of_exact(spark):
    """LSH candidates are a SUBSET of the exact pair set (no false
    positives — the verifier is exact), with recall measured against
    the planted duplicates."""
    ids, vecs = _mk_vectors(n=150, n_dups=8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in D.embedding_neardup_exact(df, threshold=0.98).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in D.embedding_neardup_pairs(df, threshold=0.98, n_planes=6).collect()
    }
    assert lsh <= exact
    assert len(lsh) >= len(exact) * 0.6  # recall floor at 6 planes


def test_decontamination_planted(spark):
    """A training doc embedding a benchmark item's text verbatim must
    flag contaminated; unrelated docs must not.  The hashed and
    string-keyed joins agree."""
    from fide_crawler_spark.operators.decontam import contamination_flags

    bench = spark.createDataFrame(
        [(0, "what is the capital of france paris obviously")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro text what is the capital of france paris obviously end"),
            (2, "completely unrelated tokens about spark shuffles and joins"),
            (3, "the capital of france is a common phrase fragment"),
        ],
        "doc_id long, text string",
    )
    for hashed in (True, False):
        got = {
            r["doc_id"]: (r["n_shared"], r["contaminated"])
            for r in contamination_flags(
                train, bench, n=8, min_overlap=1, hash_grams=hashed
            ).collect()
        }
        assert got[1][1] is True and got[1][0] >= 1
        assert got[2] == (0, False)
        assert got[3] == (0, False)  # shares words but no 8-gram


def test_ann_ivf_recall_gate_multi_seed(spark):
    """IVF recall gate (pinned): across 3 query seeds, recall@10 vs the
    exact cosine_topk must stay ≥ 0.5 — a broken cell router (wrong
    centroid math, bad probe ordering) drops this to ~k/n and fails."""
    ids, vecs = _mk_vectors(n=300, n_dups=0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    recalls = []
    for qi in (3, 57, 211):
        q = [float(x) for x in vecs[qi]]
        exact = {r["vec_id"] for r in SIM.cosine_topk(df, q, k=10).collect()}
        approx = {
            r["vec_id"]
            for r in SIM.ann_topk_ivf(df, q, k=10, n_cells=8, n_probe=3).collect()
        }
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    assert min(recalls) >= 0.3, recalls


def _incr_corpora(spark):
    base = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"alt{i}" for i in range(30))
    half = " ".join(
        [f"tok{i}" for i in range(15)] + [f"new{i}" for i in range(15)]
    )
    corpus = spark.createDataFrame(
        [(1000, base), (1001, other)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (1, base),    # exact dup of corpus 1000 -> killed
            (2, half),    # shares half the tokens -> jaccard < 0.8, survives
            (3, "u " + " ".join(f"uniq{i}" for i in range(20))),  # survives
            (4, "u " + " ".join(f"uniq{i}" for i in range(20))),  # within-batch dup of 3 -> killed
        ],
        "doc_id long, text string",
    )
    return new, corpus


def test_incremental_dedup_planted(spark):
    from fide_crawler_spark.operators.dedup import incremental_dedup

    new, corpus = _incr_corpora(spark)
    got = sorted(
        r["doc_id"] for r in incremental_dedup(new, corpus).collect()
    )
    assert got == [2, 3]


def test_incremental_dedup_precomputed_bands_identical(spark):
    from fide_crawler_spark.operators.dedup import (
        banded_signatures,
        incremental_dedup,
    )

    new, corpus = _incr_corpora(spark)
    cb = banded_signatures(corpus)
    a = sorted(r["doc_id"] for r in incremental_dedup(new, corpus).collect())
    b = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, corpus, corpus_bands=cb).collect()
    )
    assert a == b == [2, 3]


def test_incremental_dedup_empty_corpus_is_minhash_dedup(spark):
    from fide_crawler_spark.operators.dedup import (
        incremental_dedup,
        minhash_dedup,
    )

    new, _ = _incr_corpora(spark)
    empty = new.filter("doc_id < 0")
    a = sorted(r["doc_id"] for r in incremental_dedup(new, empty).collect())
    b = sorted(r["doc_id"] for r in minhash_dedup(new).select("doc_id").collect())
    assert a == b


def test_duplicated_window_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # shares tokens a..h with doc 2
            (2, "x a b c d e f g h z"),
            (3, "p q r s t u v w"),       # exactly 8 tokens, unique
            (4, "short doc"),             # < 8 tokens: no windows
            (5, "m m m m m m m m m"),     # self-repeating windows
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_ratio"])
        for r in D.duplicated_window_stats(docs, w=8).collect()
    }
    assert got == {
        1: (10, 8, 0.8),
        2: (10, 8, 0.8),
        3: (8, 0, 0.0),
        4: (2, 0, 0.0),
        5: (9, 9, 1.0),
    }


def test_duplicated_window_stats_python_replay(spark):
    """Operator vs a sequential python replay on random docs with
    planted repeated passages."""
    rng = random.Random(11)
    w = 5
    passage = "alpha beta gamma delta epsilon zeta".split()
    rows = []
    for i in range(30):
        toks = [rng.choice(VOCAB) for _ in range(20)]
        if i % 4 == 0:  # plant the shared passage at a random offset
            at = rng.randrange(0, 14)
            toks[at:at + len(passage)] = passage
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    occ: dict = {}
    for _id, text in rows:
        toks = text.split()
        for s in range(len(toks) - w + 1):
            win = " ".join(toks[s:s + w])
            occ[win] = occ.get(win, 0) + 1
    expect = {}
    for _id, text in rows:
        toks = text.split()
        cov = set()
        for s in range(len(toks) - w + 1):
            if occ[" ".join(toks[s:s + w])] >= 2:
                cov.update(range(s, s + w))
        expect[_id] = (len(toks), len(cov))

    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in D.duplicated_window_stats(docs, w=w).collect()
    }
    assert got == expect
    assert sum(v[1] for v in expect.values()) > 0  # the plant took


def test_strip_duplicated_windows(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x a b c d e f g h z"),
            (3, "p q r s t u v w"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_dropped_tokens"])
        for r in D.strip_duplicated_windows(docs, w=8).collect()
    }
    assert got == {
        1: ("i j", 8),
        2: ("x z", 8),
        3: ("p q r s t u v w", 0),
        4: ("short doc", 0),
    }
    # stats and strip agree on the dropped-token counts
    stats = {
        r["doc_id"]: r["dup_tokens"]
        for r in D.duplicated_window_stats(docs, w=8).collect()
    }
    assert {k: v[1] for k, v in got.items()} == stats


def test_strip_duplicated_windows_multi_run_intervals(spark):
    """Pins the interval-union strip form (merged [lo,hi] coverage
    runs) against a brute-force python position-set replay on shapes
    the single-passage test never exercises: several DISJOINT
    duplicated runs per doc, ADJACENT runs that merge into one
    contiguous cover, and overlapping plants."""
    import random

    w = 4
    rng = random.Random(7)
    VOCAB = [f"t{i}" for i in range(200)]  # wide vocab: no accidental dups
    p1 = [f"p{i}" for i in range(w)]       # two shared passages
    p2 = [f"q{i}" for i in range(w + 2)]   # longer than w: a 3-window run
    rows = []
    for i in range(24):
        toks = [rng.choice(VOCAB) for _ in range(30)]
        if i % 3 == 0:  # p1 at the front AND p2 later: disjoint runs
            toks[0:w] = p1
            toks[12:12 + len(p2)] = p2
        if i % 3 == 1:  # p1 twice back-to-back: adjacent runs merge
            toks[5:5 + w] = p1
            toks[5 + w:5 + 2 * w] = p1
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    occ: dict = {}
    for _id, text in rows:
        toks = text.split()
        for s in range(len(toks) - w + 1):
            win = " ".join(toks[s:s + w])
            occ[win] = occ.get(win, 0) + 1
    expect = {}
    for _id, text in rows:
        toks = text.split()
        cov: set = set()
        for s in range(len(toks) - w + 1):
            if occ[" ".join(toks[s:s + w])] >= 2:
                cov.update(range(s, s + w))
        kept = [t for i, t in enumerate(toks) if i not in cov]
        expect[_id] = (" ".join(kept), len(cov))

    got = {
        r["doc_id"]: (r["text"], r["n_dropped_tokens"])
        for r in D.strip_duplicated_windows(docs, w=w).collect()
    }
    assert got == expect
    # both multi-run shapes actually stripped something
    assert any(v[1] >= 2 * w for k, v in expect.items() if k % 3 == 0)
    assert any(v[1] >= 2 * w for k, v in expect.items() if k % 3 == 1)
