"""Best-match enrichment: per-key lookup against a small candidate
catalog, scored by Levenshtein ratio — the DGT event-matching loop.

Reference semantics (old_scripts/fide-games-scraper-public.py:116-165):
for each tournament name, search results are filtered to known event
sites, the link is stripped to a slug (prefix removed, '-' → ' '),
scored with ``lev.ratio`` against the lowercased tournament name, and
the best-scoring result is kept: ``DGT`` flag, title, link, accuracy.
The external search API itself is out of scope (network SaaS); this
operator is the data-plane half — given ANY small candidate catalog
(df of links+titles), it enriches a billion-row key table with the
best match.

Note the reference's link cleaning (``:137-141``) chains five
``result['link'].split(prefix)[-1]`` assignments, each re-reading the
RAW link — so only the last prefix ever takes effect and e.g. a
chess.com link is scored against its full URL.  That is a bug, not a
semantic; this operator strips whichever known prefix matches (the
clear intent).  ``tests/test_export_enrich.py`` pins both the intended
cleaning and the keep-first-max tie rule.

Scale shape: the catalog is the SMALL side (search results / event
registry — thousands of rows) and is broadcast; keys are first
``distinct``-reduced (the reference loops per game row, re-searching
duplicate tournament names), scored catalog-wide in one pass over the
distinct-key × candidate grid (exact ``lev.ratio`` by default — an
Arrow-batched DP over the small grid; ``scorer="fast"`` swaps in the
codegen'd built-in ``levenshtein`` form when SQL-expressibility
matters), best-of taken with ``max_by`` (one grouped
aggregate, no window), and joined back to the fact table by key.  The
fact table shuffles once (the final join's build side is the tiny
per-key best table, so with AQE it broadcasts and the fact table does
not shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fide_crawler_spark.functions import lev_ratio, lev_ratio_exact

# the reference's event-site allowlist (fide-games-scraper-public.py:136)
EVENT_PREFIXES = [
    "https://www.chess.com/events/",
    "https://www.chess.com/pt-BR/events/",
    "https://chess24.com/en/watch/live-tournaments/",
    "https://chess24.com/pt/watch/live-tournaments/",
    "https://lichess.org/broadcast/",
]


def clean_event_link(link: F.Column) -> F.Column:
    """Event link → comparable slug: strip the first matching site
    prefix, then '-' → ' ' (reference intent at
    fide-games-scraper-public.py:137-142; see module docstring for the
    chained-split bug this deliberately does not replicate).  A link
    matching no prefix yields NULL (the reference's allowlist filter at
    :136 — non-event links never score)."""
    slug = F.lit(None).cast("string")
    # build from the last prefix backwards so the FIRST matching prefix
    # in list order wins, mirroring an if/elif chain
    for p in reversed(EVENT_PREFIXES):
        slug = F.when(
            link.startswith(p), link.substr(F.lit(len(p) + 1), F.length(link))
        ).otherwise(slug)
    return F.translate(slug, "-", " ")


def best_match_enrich(
    facts: DataFrame,
    catalog: DataFrame,
    key_col: str = "tournament_name",
    link_col: str = "link",
    title_col: str = "title",
    scorer: str = "exact",
) -> DataFrame:
    """facts + (dgt, dgt_title, dgt_link, dgt_accuracy) columns.

    ``catalog`` is (link, title, pos) — ``pos`` is result order; on
    ratio ties the EARLIEST result wins (the reference's strict ``>``
    keeps the first max, :144-146).  dgt=1 iff some event-site
    candidate scored > 0; unmatched keys keep dgt=0 with empty
    title/link and accuracy 0.0 (the reference's defaults, :125-128).

    ``scorer``: ``"exact"`` (default) scores with
    ``functions.lev_ratio_exact`` — bit-parity with the reference's
    python-Levenshtein ``lev.ratio`` (2·LCS/(la+lb)), including
    alignments that involve indels; the candidate set is
    |distinct keys| × |event-site results|, so the Arrow-batched DP is
    off the hot path.  ``"fast"`` uses the pure-JVM approximation
    ``functions.lev_ratio`` ((la+lb−2·lev)/(la+lb)), which UNDER-scores
    unequal-length pairs and can rank a different candidate first when
    the optimal alignments differ in indel count — use it only when the
    score must stay SQL-expressible (q69's DuckDB oracle) or every pair
    is same-length.
    """
    score_fn = {"exact": lev_ratio_exact, "fast": lev_ratio}[scorer]
    keys = facts.select(F.col(key_col)).distinct()
    cand = (
        catalog.select(
            F.col(link_col).alias("link_raw"),
            F.col(title_col).alias("cand_title"),
            F.col("pos").alias("cand_pos"),
        )
        .withColumn("slug", clean_event_link(F.col("link_raw")))
        .filter(F.col("slug").isNotNull())
    )
    scored = (
        keys.crossJoin(F.broadcast(cand))
        .select(
            key_col,
            "cand_title",
            "link_raw",
            "cand_pos",
            score_fn(F.lower(F.col(key_col)), F.col("slug")).alias("ratio"),
        )
        .filter(F.col("ratio") > 0)
    )
    best = scored.groupBy(key_col).agg(
        F.max("ratio").alias("dgt_accuracy"),
        F.max_by(
            F.struct("cand_title", "link_raw"),
            # earliest pos wins ties: order by (ratio, -pos)
            F.struct(F.col("ratio"), (-F.col("cand_pos")).alias("neg")),
        ).alias("b"),
    )
    enriched = best.select(
        key_col,
        F.lit(1).alias("dgt"),
        F.col("b.cand_title").alias("dgt_title"),
        F.col("b.link_raw").alias("dgt_link"),
        "dgt_accuracy",
    )
    return (
        # `enriched` is |distinct keys| rows (catalog-matched subset) —
        # broadcast it so the fact table never shuffles for the join
        facts.join(F.broadcast(enriched), key_col, "left")
        .withColumn("dgt", F.coalesce("dgt", F.lit(0)))
        .withColumn("dgt_title", F.coalesce("dgt_title", F.lit("")))
        .withColumn("dgt_link", F.coalesce("dgt_link", F.lit("")))
        .withColumn(
            "dgt_accuracy", F.coalesce("dgt_accuracy", F.lit(0.0))
        )
    )
