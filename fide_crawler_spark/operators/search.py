"""Lexical search: inverted index + BM25 ranking over `documents`.

The embedding family (``operators/similarity.py``) covers dense
retrieval; this is its sparse twin — the standard keyword path a
training-data pipeline uses for targeted corpus pulls ("find documents
about X to up/down-sample") and for hybrid retrieval baselines.

Scale shape (the part that must survive 100 TB):

* ``inverted_index`` is one explode → one grouped count keyed on
  (term, doc_id) — partial map-side combine, a single shuffle.  At
  cluster scale this is written once, bucketed by term, and every
  query after that is a bucket-pruned scan (exactly the Lucene
  postings-list story expressed as a table).
* ``bm25_topk`` filters the exploded terms to the QUERY terms **before
  any shuffle** — with a persisted index this is partition/bucket
  pruning; computed inline it's a pushed-down `isin` so only matching
  postings ride the aggregation.  Corpus constants (N, avgdl) are one
  scalar aggregate broadcast-cross-joined back (one row — never a
  window over the corpus).
* Per-(doc,term) BM25 partials are rounded to 1e-6 and accumulated as
  scaled BIGINTs, so the per-doc sum is integer-exact and therefore
  independent of partition/merge order — the same determinism
  discipline as the money DECIMAL sums, and what makes the operator
  bit-oracle-able against another engine.
* Top-k ends in TakeOrderedAndProject (limit k with a doc_id
  tie-break), not a global sort.

Reference parity: the reference has no search; its closest shape is the
ad-hoc substring scan over player names (``ui/streamlit_ui.py``).  This
extends the text family per the training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fide_crawler_spark.operators.textstats import tokens_col

# BM25 free parameters (Robertson/Sparck Jones defaults).
K1 = 1.2
B = 0.75
_SCALE = 1_000_000  # per-term partials rounded to 1e-6 then summed exactly


def inverted_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf) postings — lowercase whitespace tokens.

    One explode + one grouped count.  Persist this bucketed by ``term``
    (`.write.bucketBy(n, "term")`) and ``bm25_topk`` queries become
    bucket-pruned scans with zero exchange on the postings side.
    """
    toks = F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term")
    return (
        docs.select("doc_id", toks)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dl) whitespace token counts — BM25's length normalizer."""
    return docs.select(
        "doc_id", F.size(tokens_col(F.col(text_col))).alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for ``query`` by BM25.

    Output: (doc_id, n_hits, score) — ``n_hits`` = how many distinct
    query terms the doc contains, ``score`` rounded half-up to 1e-4.
    idf uses the non-negative Lucene form ln(1 + (N − df + 0.5)/(df +
    0.5)); ties are broken by doc_id so top-k is a total order under
    any parallelism.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("bm25_topk: empty query")

    postings = inverted_index(docs, text_col).filter(F.col("term").isin(terms))
    lengths = doc_lengths(docs, text_col)

    # Corpus constants: one row, broadcast back onto the postings.
    # avgdl from integer sum/count — exact, so it cannot drift with
    # partition merge order the way a partial-avg of doubles can.
    consts = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    # Per-term document frequency — at most |terms| rows, broadcast.
    df_by_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    scored = (
        postings.join(F.broadcast(df_by_term), "term")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(consts))
    )
    n, df = F.col("n_docs").cast("double"), F.col("df").cast("double")
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(F.lit(1.0) + (n - df + 0.5) / (df + 0.5))
    tf_norm = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    # Scaled-integer partial: exact, order-independent accumulation.
    part = F.floor(idf * tf_norm * _SCALE + F.lit(0.5)).cast("bigint")

    return (
        scored.select("doc_id", part.alias("p"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum("p").alias("s"),
        )
        .select(
            "doc_id",
            F.col("n_hits").cast("int").alias("n_hits"),
            (
                F.floor(F.col("s").cast("double") / (_SCALE / 10_000) + 0.5)
                / 10_000
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("n_hits"), F.asc("doc_id"))
        .limit(k)
    )


RRF_K0 = 60  # Cormack/Clarke/Buettcher SIGIR'09 constant
_RRF_SCALE = 1_000_000_000


def rrf_fuse(
    legs: list[tuple[DataFrame, str]],
    k0: int = RRF_K0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of top-n retrieval legs.

    Each leg is ``(top_n_df, score_col)``; the df must already be a
    top-n (``.limit(n)``) result carrying ``id_col``.  Rank within a
    leg is row_number over (score desc, id asc).  The window is
    partitioned by a constant — semantically global, but over a
    post-LIMIT input that is k-scale by construction, so one partition
    IS the right plan (and the constant key keeps WindowExec from
    logging the moving-all-data warning on every task).

    Contributions are ``floor(1e9 / (k0 + rank))`` — integers, so the
    fused sum is exact and independent of leg/partition order (and of
    how many legs a doc appears in).  Output: (id, n_legs, rrf_score
    rounded to 1e-4), top-k by score with id tie-break.
    """
    if not legs:
        raise ValueError("rrf_fuse: no legs")
    ranked = []
    for df, score_col in legs:
        w = Window.partitionBy(F.lit(0)).orderBy(F.desc(score_col), F.asc(id_col))
        ranked.append(
            df.select(
                F.col(id_col),
                F.floor(
                    F.lit(float(_RRF_SCALE))
                    / (F.lit(k0) + F.row_number().over(w)).cast("double")
                )
                .cast("bigint")
                .alias("c"),
            )
        )
    allc = ranked[0]
    for r in ranked[1:]:
        allc = allc.unionByName(r)
    return (
        allc.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_legs"),
            F.sum("c").alias("s"),
        )
        .select(
            id_col,
            "n_legs",
            (
                F.floor(F.col("s").cast("double") / (_RRF_SCALE / 10_000) + 0.5)
                / 10_000
            ).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )
