"""Frontier generation, canonicalization, admission, priority.

Reference behavior (cites into /root/reference/):

* month-walk URL generation — while-loop ``+= relativedelta(months=1)``
  building one calc-table URL per (player, month),
  ``data_processing/data_fetching_processing.py:125-138``.  Spark form:
  ``sequence(start, end, interval 1 month)`` + ``explode`` (SURVEY H9) —
  generation itself is distributed, no driver loop.
* URL canonicalization — ``re.search(r'/profile/(\\d+)', url)``
  (``:64-65``); admission filter ``'profile' in url and 'news' not in
  url`` (``:68``).
* crawl order — sequential list order: player in seed order, month
  ascending (``:136-140``).  Realized as a windowed rank (north-rule
  priority queue) over (host_rank, depth, recrawl_age desc, seed_pos,
  period): order is data, not execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRONTIER_COLS = [
    "url", "url_hash", "host", "fide_id", "period", "depth", "host_rank",
    "recrawl_age", "seed_pos", "status", "retry_count", "epoch",
]


def generate_frontier(
    seeds: DataFrame,
    start: str,
    end: str,
    host: str = "ratings.fide.com",
) -> DataFrame:
    """seeds(fide_id, seed_pos[, host_rank]) × month range → frontier rows.

    The month sequence is built with ``sequence + explode`` so a
    10^10-row frontier (10^7 players × 10^3 periods) is generated
    executor-side from a small seed table — the driver never holds it.
    """
    if "host_rank" not in seeds.columns:
        seeds = seeds.withColumn("host_rank", F.lit(0))
    months = F.explode(
        F.sequence(
            F.trunc(F.to_date(F.lit(start)), "month"),
            F.trunc(F.to_date(F.lit(end)), "month"),
            F.expr("interval 1 month"),
        )
    ).alias("period")
    url = F.format_string(
        "https://%s/a_indv_calculations.php?id_number=%s&rating_period=%s&t=0",
        F.lit(host),
        F.col("fide_id"),
        F.date_format("period", "yyyy-MM-dd"),
    )
    return (
        seeds.select("fide_id", "seed_pos", "host_rank", months)
        .select(
            url.alias("url"),
            F.xxhash64(url).alias("url_hash"),
            F.lit(host).alias("host"),
            "fide_id",
            "period",
            F.lit(2).alias("depth"),
            "host_rank",
            F.lit(0).alias("recrawl_age"),
            "seed_pos",
            F.lit("pending").alias("status"),
            F.lit(0).alias("retry_count"),
            F.lit(-1).alias("epoch"),
        )
    )


def canonicalize_profile_urls(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Seed-search admission + canonicalization (B10 + H1).

    Keeps URLs matching the reference's filter
    (data_fetching_processing.py:66-73: 'profile' in url, 'news' not in
    url, numeric id extractable) and rewrites them to the canonical
    profile form keyed by the extracted id.  All other input columns
    pass through, so the search stage's (name, title, result_pos)
    survive admission.
    """
    admitted = urls.filter(
        F.col(url_col).contains("profile") & ~F.col(url_col).contains("news")
    )
    fide_id = F.regexp_extract(F.col(url_col), r"/profile/(\d+)", 1)
    passthrough = [c for c in urls.columns if c not in ("fide_id", url_col)]
    return admitted.select(
        fide_id.alias("fide_id"),
        F.concat(F.lit("https://ratings.fide.com/profile/"), fide_id).alias("url"),
        *passthrough,
    ).filter(F.col("fide_id") != "")


def priority_order() -> list:
    """Total priority order: the north-rule (host_rank, depth,
    recrawl_age) tuple, then the reference's (seed_pos, period) crawl
    order, with ``url`` as the final tie-break so the order is total →
    deterministic under any parallelism."""
    return [
        F.col("host_rank").asc(),
        F.col("depth").asc(),
        F.col("recrawl_age").desc(),
        F.col("seed_pos").asc(),
        F.col("period").asc(),
        F.col("url").asc(),
    ]


def with_priority_rank(
    frontier: DataFrame, caches: list | None = None
) -> DataFrame:
    """North-rule priority queue (SURVEY W3): global rank over the
    frontier in priority order.  The *semantic* is a single queue, but
    the plan must never be the naive ``row_number().over(Window.
    orderBy(...))`` — an unpartitioned window serializes the whole
    frontier into ONE task.  Delegates to `rank.grouped_rank` with an
    empty group: two fully-parallel passes (range-partitioned sort +
    broadcast prefix offsets) with identical ranks (the priority order
    is total).  Pass ``caches`` to release the operator's persisted
    sort layout after consuming the result (see grouped_rank).  The
    scheduler's hot path uses the fused `rank.dequeue_rank` instead,
    which folds the per-host politeness cap into the same sorted pass.
    """
    from fide_crawler_spark.operators.rank import grouped_rank

    return grouped_rank(frontier, [], priority_order(), caches=caches)
