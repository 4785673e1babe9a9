"""Sequential single-threaded oracle for the crawl pipeline.

A tiny reimplementation of the reference's loop semantics
(``/root/reference/data_processing/data_fetching_processing.py``):

* crawl order — player in seed order, then month ascending (``:136-140``),
  generalized to the engine's priority tuple (host_rank, depth,
  -recrawl_age, seed_pos, period, url) with the same per-host politeness
  budget per epoch;
* URL-seen — a URL is fetched at most once (``:216-234`` gap analysis at
  month granularity);
* fetch+parse — the same deterministic synthetic fetcher
  (``fixtures.render_page``) and page parser (``fixtures.parse_page``),
  run strictly sequentially.

pytest asserts span-sequence equality (kind, text, media_ref, order),
crawl-order equality, and URL-seen-set equality between this oracle and
the distributed scheduler (BASELINE.json:north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from fide_crawler_spark.fixtures import parse_page, render_page


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)
    epochs: list[list[str]] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    spans: dict[str, list[tuple]] = field(default_factory=dict)


def priority_key(row: dict) -> tuple:
    return (
        row["host_rank"],
        row["depth"],
        -row["recrawl_age"],
        row["seed_pos"],
        row["period"],
        row["url"],
    )


def run_oracle(frontier_rows: list[dict], budget_per_host: int) -> OracleResult:
    """Sequential crawl with the same politeness contract as CrawlJob:
    each epoch dequeues at most ``budget_per_host`` pending URLs per
    host, in priority order, until the frontier drains."""
    res = OracleResult()
    pending = {r["url"]: dict(r) for r in frontier_rows}
    while pending:
        ordered = sorted(pending.values(), key=priority_key)
        taken_per_host: dict[str, int] = {}
        epoch_urls: list[str] = []
        for row in ordered:
            h = row["host"]
            if taken_per_host.get(h, 0) >= budget_per_host:
                continue
            taken_per_host[h] = taken_per_host.get(h, 0) + 1
            epoch_urls.append(row["url"])
        if not epoch_urls:
            break
        for url in epoch_urls:
            if url in res.url_seen:
                continue
            res.url_seen.add(url)
            res.crawl_order.append(url)
            res.spans[url] = parse_page(render_page(url))
            del pending[url]
        res.epochs.append(epoch_urls)
    return res
