"""Scalar column helpers (SURVEY §2.H) — thin, composable Column
expressions shared by operators and queries.  Everything is JVM-side;
nothing here ever drops to Python."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lev_ratio(a: Column | str, b: Column | str) -> Column:
    """Levenshtein *ratio* exactly as python-Levenshtein's ``lev.ratio``
    (the reference's best-match scorer,
    old_scripts/fide-games-scraper-public.py:144):
    (la + lb - 2*dist') / (la + lb) where dist' weights substitutions 2
    — equal to 1 - dist/max(la,lb) only approximately, so we expose the
    simple normalized similarity and the exact ratio separately."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    la, lb = F.length(a), F.length(b)
    return (la + lb - 2 * F.levenshtein(a, b)) / (la + lb)


def lev_similarity(a: Column | str, b: Column | str) -> Column:
    """1 - levenshtein/greatest(len) — the normalized edit similarity
    used by q8_similarity_join."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.lit(1.0) - F.levenshtein(a, b).cast("double") / F.greatest(
        F.length(a), F.length(b)
    )


def profile_id(url: Column | str) -> Column:
    """H1: regexp_extract(r'/profile/(\\d+)')
    (data_fetching_processing.py:64-65)."""
    return F.regexp_extract(url, r"/profile/(\d+)", 1)


def digits_only(c: Column | str) -> Column:
    """H2/H3: strip non-digits before numeric cast
    (data_fetching_processing.py:113,200)."""
    return F.regexp_replace(c, r"\D", "")


def data_uri_bytes(c: Column | str) -> Column:
    """H17: base64 data-URI → bytes (profile photo decode,
    ui/streamlit_ui.py:16-19)."""
    return F.unbase64(F.substring_index(c, ",", -1))


def month_start(c: Column | str) -> Column:
    """H8: date.replace(day=1) (data_fetching_processing.py:129)."""
    return F.trunc(c, "month")


def points_games_str(points: Column, games: Column) -> Column:
    """H12/H13: '6/7' with integer points rendered without decimals
    (ui/streamlit_ui.py:179-181)."""
    pts_str = F.when(
        points == F.floor(points), F.format_string("%.0f", points)
    ).otherwise(points.cast("string"))
    return F.concat(pts_str, F.lit("/"), games.cast("string"))
