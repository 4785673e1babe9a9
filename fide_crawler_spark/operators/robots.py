"""robots.txt cache + admission filter (north-rule component).

The reference has no robots handling (it sleeps 1 s and hopes,
``old_scripts/fide-games-scraper-public.py:160``); a 10^10-URL crawler
needs per-host disallow rules enforced at admission:

* ``fetch_robots`` — one fetch per DISTINCT host (a mapInPandas batch
  stage like the page fetcher; synthetic mode derives deterministic
  disallow prefixes from the host hash, real mode GETs /robots.txt and
  parses ``Disallow:`` lines for ``User-agent: *``);
* the parsed rules live in a **robots snapshot table** (host →
  array<disallow-prefix>), refreshed per crawl, time-traveling with the
  frontier — the "robots.txt cache";
* ``robots_filter`` — broadcast join on host + a JVM higher-order
  ``exists(rules, r -> startswith(path, r))`` predicate: hosts number
  ≤ millions (broadcastable) even when URLs number 10^10, and the
  filter runs scan-side with zero Python.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = "host string, rules array<string>, ok boolean"


def _synthetic_rules(host: str) -> list[str]:
    """Deterministic pseudo-robots: every host disallows a couple of
    path prefixes derived from its hash; ~1/4 of hosts also disallow a
    slice of the calc-page id space (so some real frontier URLs are
    actually blocked in tests)."""
    h = zlib.crc32(host.encode())
    rules = ["/private", f"/tmp{h % 10}"]
    if h % 4 == 0:
        # blocks ids whose decimal form starts with this digit (1..4,
        # varying per host)
        digit = (h // 4) % 4 + 1
        rules.append(f"/a_indv_calculations.php?id_number={digit}")
    return rules


def _parse_robots_txt(text: str) -> list[str]:
    """Minimal robots parser: Disallow prefixes under User-agent: *."""
    rules, active = [], False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*"
        elif key == "disallow" and active and val:
            rules.append(val)
    return rules


def fetch_robots(hosts: DataFrame, mode: str = "synthetic") -> DataFrame:
    """hosts(host) → (host, rules).  One request per distinct host."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if mode == "synthetic":
                rules = [_synthetic_rules(h) for h in pdf["host"]]
                oks = [True] * len(pdf)
            else:
                import urllib.error
                import urllib.request

                rules, oks = [], []
                for h in pdf["host"]:
                    try:
                        with urllib.request.urlopen(
                            f"https://{h}/robots.txt", timeout=10
                        ) as resp:
                            rules.append(_parse_robots_txt(resp.read().decode()))
                            oks.append(True)
                    except urllib.error.HTTPError as err:
                        # RFC 9309 §2.3.1: 4xx "unavailable" → crawl
                        # allowed; 5xx/other "unreachable" → full disallow
                        # UNTIL re-fetched (ok=False marks a transient
                        # answer the cache must not pin forever)
                        ok4 = 400 <= err.code < 500
                        rules.append([] if ok4 else ["/"])
                        oks.append(ok4)
                    except Exception:
                        rules.append(["/"])  # unreachable → fail CLOSED
                        oks.append(False)
            yield pd.DataFrame({"host": pdf["host"], "rules": rules, "ok": oks})

    return hosts.select("host").distinct().mapInPandas(run, schema=ROBOTS_SCHEMA)


def url_path(url_col) -> F.Column:
    """Strip scheme+host → the path (+query) robots rules match on."""
    return F.regexp_replace(url_col, r"^[a-z]+://[^/]+", "")


def robots_filter(
    frontier: DataFrame, robots: DataFrame, mark: bool = True
) -> DataFrame:
    """Apply the cached rules: rows whose path matches any disallow
    prefix are marked status='blocked' (mark=True — they stay in the
    frontier as an audit trail and never dequeue) or dropped."""
    extra = [c for c in robots.columns if c != "host"]
    joined = frontier.join(F.broadcast(robots), "host", "left")
    path = url_path(F.col("url"))
    blocked = F.exists(
        F.coalesce(F.col("rules"), F.array().cast("array<string>")),
        lambda r: path.startswith(r),
    )
    if mark:
        return joined.withColumn(
            "status", F.when(blocked, F.lit("blocked")).otherwise(F.col("status"))
        ).drop(*extra)
    return joined.filter(~blocked).drop(*extra)
