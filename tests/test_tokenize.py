"""build_vocab / encode_docs vs pure-Python references."""

from __future__ import annotations

from collections import Counter

from fide_crawler_spark.operators import tokenize as TK

ROWS = [
    (0, "a b a c d a b e"),
    (1, "b b c f g"),
    (2, "zzz a qqq a"),
]


def _py_vocab(rows, size):
    c = Counter(t for _, text in rows for t in text.split(" "))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    return {t: i + 1 for i, (t, _) in enumerate(ranked)}


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_vocab_ids_match_reference(spark):
    got = {
        r["token"]: (r["token_id"], r["freq"])
        for r in TK.build_vocab(_docs(spark), vocab_size=4).collect()
    }
    want_ids = _py_vocab(ROWS, 4)
    c = Counter(t for _, text in ROWS for t in text.split(" "))
    assert got == {t: (i, c[t]) for t, i in want_ids.items()}


def test_encode_roundtrip_order_and_oov(spark):
    docs = _docs(spark)
    vocab = TK.build_vocab(docs, vocab_size=4)
    v = _py_vocab(ROWS, 4)
    got = {
        r["doc_id"]: r["token_ids"]
        for r in TK.encode_docs(docs, vocab).collect()
    }
    want = {
        i: [v.get(t, TK.OOV_ID) for t in text.split(" ")] for i, text in ROWS
    }
    assert got == want
    # rare tokens fell out of the top-4 -> OOV zeros present
    assert TK.OOV_ID in got[2]


def test_encode_parallelism_invariant(spark):
    docs = _docs(spark)
    vocab = TK.build_vocab(docs, vocab_size=4)
    a = {r["doc_id"]: r["token_ids"]
         for r in TK.encode_docs(docs.coalesce(1), vocab).collect()}
    b = {r["doc_id"]: r["token_ids"]
         for r in TK.encode_docs(docs.repartition(5), vocab).collect()}
    assert a == b


def test_vocab_tie_break_is_lexicographic(spark):
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "y x")], "doc_id long, text string"
    )
    rows = TK.build_vocab(docs, vocab_size=2).collect()
    assert [(r["token"], r["token_id"]) for r in sorted(rows, key=lambda r: r["token_id"])] == [
        ("x", 1), ("y", 2)
    ]
