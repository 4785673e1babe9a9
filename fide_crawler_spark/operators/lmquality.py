"""CCNet-style n-gram language-model quality scoring.

Wenzek et al. 2019 ("CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") filters web-crawl text by per-document
perplexity under a small language model trained on a trusted corpus.
The reference crawler keeps only digit-clean rating rows
(data_processing/data_fetching_processing.py:200) — this operator is
the corpus-scale generalization of that "does this text look like the
corpus I trust" gate, realized as a bigram LM with add-k smoothing.

Spark-first design (100 TB shape):
- The vocabulary is the top-``vocab_size`` tokens (count desc, token
  asc tie-break — deterministic), collected once (``vocab_size`` rows)
  and pushed back as a literal ``isin`` set: Catalyst compiles a large
  IN to an O(1) hash-set probe (``InSet``), so token→vocab mapping is
  one codegen'd projection, no join, no shuffle of the text.
- Model tables are bounded by construction — unigrams ≤ V+1 rows,
  bigrams ≤ (V+1)² — and are broadcast onto the per-document bigram
  stream; the only shuffle in the scoring path is the final
  ``groupBy(doc_id)`` with map-side partial aggregation, and the only
  shuffles in training carry mapped tokens (cardinality ≤ (V+1)²
  after the vocab projection), never raw text.
- Bigrams are built with JVM higher-order functions
  (``transform(sequence(...))``) over the token array — no per-doc
  window, no self-join, no Python.

Float discipline: each bigram's log-probability is snapped to a
scaled BIGINT (``floor(ln(p)*1e9 + 0.5)``) before summing, so the
per-document sum is exact integer arithmetic — independent of
partition order and bit-identical in the DuckDB oracle; the final
nll/ppl are floor-rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"
LOG_SCALE = 1_000_000_000  # 1e9: log-prob fixed-point scale


def _mapped_tokens(docs: DataFrame, text_col: str, vocab: list[str]):
    """Token array with out-of-vocabulary tokens collapsed to <unk> —
    one projection (InSet membership), no join."""
    toks = F.split(F.col(text_col), " ")
    return F.transform(
        toks, lambda t: F.when(t.isin(vocab), t).otherwise(F.lit(UNK))
    )


def lm_perplexity(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vocab_size: int = 256,
    add_k: float = 0.5,
) -> DataFrame:
    """Score every document's perplexity under a bigram LM trained on
    ``train_docs`` (default: the same corpus — self-perplexity, the
    CCNet in-domain configuration).

    Model: vocab = top-``vocab_size`` tokens of the training corpus;
    P(cur|prev) = (c(prev,cur) + k) / (c(prev) + k·V') with
    V' = |vocab ∪ {<unk>}| and c(prev) the mapped unigram count.

    Returns (doc_id, n_bigrams, nll, ppl) for documents with ≥1
    bigram; nll = -mean log P, ppl = exp(nll), both floor-rounded to
    4 decimals.
    """
    spark = docs.sparkSession
    train = train_docs if train_docs is not None else docs

    # -- train: vocab (TakeOrdered — no full sort), bounded count tables
    tok_tr = train.select(
        F.explode(F.split(F.col(text_col), " ")).alias("t")
    )
    vocab_rows = (
        tok_tr.groupBy("t").count()
        .orderBy(F.col("count").desc(), F.col("t").asc())
        .limit(vocab_size)
        .collect()
    )
    vocab = [r["t"] for r in vocab_rows]
    v_prime = len(vocab) + 1  # + <unk>

    def _bigrams(arr):
        """(prev, cur) struct array from a token array — JVM
        higher-order functions only.  ``sequence(1, stop)`` counts DOWN
        when stop < 1, so the <2-token case is gated explicitly."""
        return F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: F.struct(
                    F.element_at(arr, i).alias("prev"),
                    F.element_at(arr, i + 1).alias("cur"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))

    # -- train counts: ONE pass.  Every position i emits
    # (prev=m[i], cur=m[i+1] | NULL-if-last), so grouping by
    # (prev, cur) yields the bigram counts (cur NOT NULL) AND the
    # mapped unigram counts (row-sum over cur per prev — each token is
    # `prev` exactly once) from a single scan + one partial-agg
    # shuffle.  The result is bounded by construction
    # (≤ (V+1)² + V+1 rows), so collecting it is the same bounded
    # fan-in as the vocab collect above; the r5 form ran two separate
    # scans+aggregates (cu, cb) and broadcast both.
    m_tr = train.select(_mapped_tokens(train, text_col, vocab).alias("m"))
    m = F.col("m")
    pos_pairs = F.transform(
        F.sequence(F.lit(1), F.size(m)),
        lambda i: F.struct(
            F.element_at(m, i).alias("prev"),
            F.when(i < F.size(m), F.element_at(m, i + 1)).alias("cur"),
        ),
    )
    pair_rows = (
        m_tr.select(F.explode(pos_pairs).alias("p"))
        .groupBy("p.prev", "p.cur")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    cb_map: dict[tuple[str, str], int] = {}
    cu_map: dict[str, int] = {}
    for r in pair_rows:
        cu_map[r["prev"]] = cu_map.get(r["prev"], 0) + r["c"]
        if r["cur"] is not None:
            cb_map[(r["prev"], r["cur"])] = r["c"]

    # -- model: the COMPLETE (V+1)² log-prob grid (seen and smoothed-
    # unseen cells), computed by the same JVM expression as before so
    # every lp value is bit-identical, broadcast as ONE table.  Every
    # mapped bigram hits exactly one grid row, so scoring is a single
    # INNER broadcast join instead of two LEFT joins against separate
    # cb/cu tables.
    vset = vocab + ([UNK] if UNK not in vocab else [])
    grid = [
        (p, c, cb_map.get((p, c), 0), cu_map.get(p, 0))
        for p in vset
        for c in vset
    ]
    lp_tbl = spark.createDataFrame(
        grid, "prev string, cur string, cb long, cu long"
    ).select(
        "prev",
        "cur",
        F.floor(
            F.log(
                (F.col("cb") + F.lit(add_k))
                / (
                    F.col("cu").cast("double")
                    + F.lit(add_k) * F.lit(float(v_prime))
                )
            )
            * F.lit(float(LOG_SCALE))
            + F.lit(0.5)
        ).cast("bigint").alias("lp"),
    )

    # -- score: per-doc bigram stream × broadcast model
    doc_big = (
        docs.select(
            F.col(doc_id_col), _mapped_tokens(docs, text_col, vocab).alias("m")
        )
        .select(F.col(doc_id_col), F.explode(_bigrams(F.col("m"))).alias("b"))
        .select(doc_id_col, "b.prev", "b.cur")
    )
    agg = (
        doc_big.join(F.broadcast(lp_tbl), ["prev", "cur"])
        .groupBy(doc_id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("s"))
    )
    nll = -(F.col("s").cast("double") / (F.col("n_bigrams").cast("double") * F.lit(float(LOG_SCALE))))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return agg.select(
        doc_id_col,
        "n_bigrams",
        r4(nll).alias("nll"),
        r4(F.exp(nll)).alias("ppl"),
    )
