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


def test_partition_overwrite_rewrites_only_touched(spark, tmp_path):
    """Dynamic-partition commits: snapshot N+1 writes data files only
    for partitions present in the update; others carry forward by
    manifest reference to the parent's files."""
    import os

    from fide_crawler_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(str(tmp_path / "pt"))
    full = spark.createDataFrame(
        [(p, u, "pending") for p in ("a", "b", "c") for u in range(4)],
        "period string, u long, status string",
    )
    t.commit_partition_overwrite(full, "period")
    upd = spark.createDataFrame(
        [("b", u, "fetched") for u in range(4)], "period string, u long, status string"
    )
    t.commit_partition_overwrite(upd, "period")

    snap1 = os.path.join(t.root, "snap-00001", "data")
    assert sorted(d for d in os.listdir(snap1) if d.startswith("_pt=")) == ["_pt=b"]
    parts = t.manifest()["partitions"]
    assert parts["b"].startswith("snap-00001/")
    assert parts["a"].startswith("snap-00000/") and parts["c"].startswith("snap-00000/")

    cur = t.read(spark)
    assert cur.count() == 12
    got = {r["period"]: r["status"] for r in cur.select("period", "status").distinct().collect()}
    assert got == {"a": "pending", "b": "fetched", "c": "pending"}


def test_partition_overwrite_refuses_unpartitioned_parent(spark, tmp_path):
    import pytest

    from fide_crawler_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(str(tmp_path / "plain"))
    df = spark.createDataFrame([("a", 1)], "period string, u long")
    t.commit(df)
    with pytest.raises(ValueError, match="unpartitioned parent"):
        t.commit_partition_overwrite(df, "period")


def test_epoch_commit_touches_only_dequeued_periods(spark, tmp_path):
    """The scheduler's frontier commit is a touched-partition rewrite:
    an epoch that dequeues two months writes files for exactly those
    two period partitions."""
    import os

    from fide_crawler_spark.fixtures import seed_frontier_rows
    from fide_crawler_spark.operators.scheduler import CrawlJob

    rows = seed_frontier_rows(["4040404"], "2023-01-01", 6)
    j = CrawlJob(spark, str(tmp_path / "touch"), budget_per_host=2, n_salts=2)
    j.init(spark.createDataFrame(rows))
    j.run_epoch()

    snap1 = os.path.join(j.frontier_tbl.root, "snap-00001", "data")
    written = sorted(d for d in os.listdir(snap1) if d.startswith("_pt="))
    assert written == ["_pt=2023-01-01", "_pt=2023-02-01"], written
    parts = j.frontier_tbl.manifest()["partitions"]
    assert parts["2023-03-01"].startswith("snap-00000/")
    # table view stays complete and consistent
    fr = j.frontier_tbl.read(spark)
    assert fr.count() == 6
    assert fr.filter("status = 'fetched'").count() == 2
