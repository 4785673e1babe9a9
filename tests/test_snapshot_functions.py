"""SnapshotTable upsert semantics + scalar function helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fide_crawler_spark.functions import (
    data_uri_bytes,
    digits_only,
    lev_ratio,
    month_start,
    points_games_str,
    profile_id,
)
from fide_crawler_spark.sources.snapshot import SnapshotTable, upsert


def test_upsert_merge_semantics(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "players"))
    base = spark.createDataFrame(
        [("1", "Magnus", 2830), ("2", "Hikaru", 2780)],
        "fide_id string, name string, rating int",
    )
    upsert(t, spark, base, "fide_id")
    updates = spark.createDataFrame(
        [("2", "Hikaru", 2790), ("3", "Gukesh", 2770)],
        "fide_id string, name string, rating int",
    )
    upsert(t, spark, updates, "fide_id")
    got = {r["fide_id"]: r["rating"] for r in t.read(spark).collect()}
    assert got == {"1": 2830, "2": 2790, "3": 2770}
    # time travel: snapshot 0 still shows the pre-merge state
    old = {r["fide_id"]: r["rating"] for r in t.read(spark, 0).collect()}
    assert old == {"1": 2830, "2": 2780}


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def test_profile_id_and_digits(one):
    r = one.select(
        profile_id(F.lit("https://ratings.fide.com/profile/1503014")).alias("a"),
        profile_id(F.lit("https://fide.com/news/123")).alias("none"),
        digits_only(F.lit("2,830 pts")).alias("d"),
    ).first()
    assert r["a"] == "1503014" and r["none"] == "" and r["d"] == "2830"


def test_data_uri_bytes(one):
    import base64

    payload = base64.b64encode(b"hello").decode()
    r = one.select(
        data_uri_bytes(F.lit(f"data:image/png;base64,{payload}")).alias("b")
    ).first()
    assert bytes(r["b"]) == b"hello"


def test_lev_ratio_matches_definition(one):
    # lev.ratio('menorca open', 'menorca opens'): la+lb=25, dist=1 (insert,
    # weight 1 in the (la+lb-2d)... definitional check vs a hand value
    r = one.select(lev_ratio(F.lit("abcd"), F.lit("abxd")).alias("r")).first()
    assert abs(r["r"] - (8 - 2 * 1) / 8) < 1e-9


def test_month_start_and_points_str(one):
    r = one.select(
        month_start(F.lit("2023-05-17").cast("date")).alias("m"),
        points_games_str(F.lit(6.0), F.lit(7)).alias("a"),
        points_games_str(F.lit(5.5), F.lit(9)).alias("b"),
    ).first()
    assert str(r["m"]) == "2023-05-01"
    assert r["a"] == "6/7" and r["b"] == "5.5/9"


def test_lev_ratio_exact_matches_definition(spark):
    """lev.ratio (sub cost 2) == 2*LCS/(la+lb): indel case where the JVM
    approximation under-scores."""
    from fide_crawler_spark.functions import lev_ratio_exact

    df = spark.createDataFrame(
        [("abc", "ab"), ("menorca open", "menorca opens"), ("abcd", "abxd"),
         ("", ""), ("a", "b")],
        "a string, b string",
    )
    got = {(r["a"], r["b"]): r["r"] for r in
           df.select("a", "b", lev_ratio_exact("a", "b").alias("r")).collect()}
    assert abs(got[("abc", "ab")] - 4 / 5) < 1e-9          # lev.ratio = 0.8
    assert abs(got[("menorca open", "menorca opens")] - 24 / 25) < 1e-9
    assert abs(got[("abcd", "abxd")] - 6 / 8) < 1e-9        # sub-only case
    assert got[("", "")] == 1.0
    assert got[("a", "b")] == 0.0
