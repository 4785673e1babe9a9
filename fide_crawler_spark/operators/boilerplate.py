"""Line-level boilerplate removal — strip lines shared across many
documents (cookie banners, nav bars, footers) before training.

The CCNet preprocessing insight (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", 2019):
paragraph/line-level duplication across documents is almost always
template boilerplate, and removing it both deduplicates and improves
text quality.  The reference crawler stores page text verbatim (its
parse at data_processing/data_fetching_processing.py:122-205 keeps
every row); this extends the text-pipeline family per the brief's
training-data mandate.

Scale shape (100 TB corpus):

* lines are keyed by ``xxhash64(line)`` — 8-byte fixed keys, never the
  line text, ride the frequency shuffle (same discipline as
  ngram_jaccard / corpus_ngram_topk);
* doc-frequency = two partial-combined grouped aggregates (dedupe
  (line_key, doc) then count) — no COUNT DISTINCT expansion;
* stripping is a co-keyed LEFT ANTI join of exploded lines against the
  boilerplate key set (broadcastable when small, shuffle-join when the
  template set is heavy-tailed — AQE decides);
* reassembly groups by doc — per-task memory is bounded by document
  size, the same bound the parse stage already holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _line_key(line: Column, portable: bool) -> Column:
    if portable:
        from fide_crawler_spark.operators.dedup import md5h

        return md5h(line)
    return F.xxhash64(line)


def line_doc_freq(
    docs: DataFrame,
    delimiter: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(line_key, line, doc_freq): how many DOCUMENTS contain each
    line (a line repeated within one doc counts once).  ``portable``
    keys by md5h for DuckDB-reproducible runs; production keys by
    xxhash64."""
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), delimiter)).alias("line"),
    )
    per_doc = (
        lines.select(
            id_col, _line_key(F.col("line"), portable).alias("line_key"), "line"
        )
        .groupBy("line_key", id_col)
        .agg(F.min("line").alias("line"))
    )
    return per_doc.groupBy("line_key").agg(
        F.min("line").alias("line"),
        F.count(F.lit(1)).alias("doc_freq"),
    )


def strip_boilerplate(
    docs: DataFrame,
    min_doc_freq: int = 2,
    delimiter: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
    boiler_keys: DataFrame | None = None,
    broadcast_boiler: bool | None = None,
) -> DataFrame:
    """Remove every line whose doc-frequency ≥ ``min_doc_freq``;
    remaining lines are reassembled in their original order.  Output:
    (id, n_lines_before, n_lines_after, cleaned_text); a doc that was
    pure boilerplate survives with cleaned_text='' and 0 lines (the
    quality gate downstream drops it — this operator only removes
    lines, never rows).

    ``boiler_keys`` injects a precomputed (line_key) set — the
    streaming form, where line frequency accumulates across micro-
    batches (streaming/curation.py) and the stripping of THIS batch
    uses the corpus-so-far frequencies.  The keys must be built with
    the same ``portable`` flag as this call.

    Heavy-template skew (the real web case — one banner line in ~every
    doc): in a shuffled LEFT ANTI join every copy of a hot line lands
    in one task, an O(corpus) straggler.  Two mitigations, both
    witness-tested at a skewed fixture (tests/test_boilerplate.py):

    * ``broadcast_boiler=True`` — the boilerplate KEY set (8-byte keys,
      bounded by the distinct-template count, not the corpus) is
      broadcast, so exploded lines are never shuffled at all: each scan
      task anti-filters its own rows, balanced by construction.
    * ``broadcast_boiler=None`` (default) — Catalyst/AQE decide: a
      small aggregate side auto-broadcasts; if the template set is too
      big to broadcast, AQE's skew-join splits the hot probe-side
      partitions (LeftAnti left-side splitting is semantics-safe —
      each row's membership test is independent)."""
    boiler = (
        line_doc_freq(docs, delimiter, id_col, text_col, portable)
        .filter(F.col("doc_freq") >= min_doc_freq)
        .select("line_key")
        if boiler_keys is None
        # CONTRACT: boiler_keys must be UNIQUE per line_key (true for
        # every producer in-repo — line_doc_freq output and the
        # streaming groupBy-sum state).  The membership MARK below
        # multiplies per matching build row where the r5 anti-join
        # merely dropped, and an unconditional .distinct() here would
        # sit between the build-side Exchange and the join, breaking
        # AQE's skew-split pattern match for the heavy-template case
        # (witness-tested).
        else boiler_keys.select("line_key")
    )
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    # ONE pass over the exploded lines: membership is a LEFT join MARK
    # instead of an anti-join, so before/after line counts and the
    # reassembled text all come from a single groupBy — the r5 form
    # scanned `docs` twice more (an anti-join branch plus a separate
    # n_lines_before base joined back at the end).  Boilerplate lines
    # still never ride the reassembly shuffle as text: the line is
    # nulled at the mark, so a stripped row shuffles as (pos, NULL) —
    # a few bytes — and the per-doc sort-and-filter drops it.
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delimiter)).alias("pos", "line"),
    ).withColumn("line_key", _line_key(F.col("line"), portable))
    marked = exploded.join(
        boiler.withColumn("__boiler", F.lit(True)), "line_key", "left"
    )
    keep_line = F.when(F.col("__boiler").isNull(), F.col("line"))
    kept_sorted = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", keep_line.alias("line")))),
        lambda s: s["line"].isNotNull(),
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lines_before"),
        F.count(keep_line).cast("int").alias("n_lines_after"),
        F.array_join(
            F.transform(kept_sorted, lambda s: s["line"]), delimiter
        ).alias("cleaned_text"),
    )
