"""Parity with the reference's golden artifacts:

* ``/root/reference/database/fide_data.db`` — 196 crawled game rows
  (the analytics operators must reproduce the pandas UI computations
  on them);
* ``/root/reference/pickles/*.pkl`` — tournament summaries whose
  Performance Rating column is the oracle for the dp-lookup operator.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fide_crawler_spark.operators import games as G
from fide_crawler_spark.operators.perf_rating import DP_TABLE, with_performance_rating

DB = "/root/reference/database/fide_data.db"
PICKLES = [
    "/root/reference/pickles/Erigaisi Arjun.pkl",
    "/root/reference/pickles/Niemann, Hans Moke.pkl",
    "/root/reference/pickles/gukesh d.pkl",
]


@pytest.fixture(scope="module")
def golden_pdf() -> pd.DataFrame:
    with sqlite3.connect(DB) as con:
        return pd.read_sql("SELECT * FROM game_history", con)


@pytest.fixture(scope="module")
def games(spark, golden_pdf):
    raw = spark.createDataFrame(golden_pdf.astype(str))
    return G.typed_ingest(raw).persist()


def test_typed_ingest_full(games, golden_pdf):
    assert games.count() == len(golden_pdf)
    assert games.filter(F.col("date").isNull()).count() == 0
    assert games.filter(~F.col("result").isin(1.0, 0.5, 0.0)).count() == 0


def test_dedup_is_idempotent_on_golden(games):
    # the golden DB is purged on startup (main.py:8-9) → already unique
    assert G.dedup_keepfirst(games).count() == games.count()


def test_elo_evolution_matches_pandas(games, golden_pdf):
    got = {r["fide_id"]: r for r in G.elo_evolution(games).collect()}
    pdf = golden_pdf.copy()
    pdf["date"] = pd.to_datetime(pdf["date"])
    pdf["player_rating"] = pd.to_numeric(pdf["player_rating"])
    pdf["opponent_rating"] = pd.to_numeric(pdf["opponent_rating"])
    for fid, grp in pdf.groupby("fide_id"):
        # reference iloc[0]/iloc[-1] of the date-sorted frame
        # (ui/streamlit_ui.py:136-138); id breaks same-date ties
        grp = grp.sort_values(["date", "id"])
        r = got[fid]
        assert r["initial_rating"] == grp.iloc[0]["player_rating"]
        assert r["final_rating"] == grp.iloc[-1]["player_rating"]
        assert r["delta_rating"] == grp.iloc[-1]["player_rating"] - grp.iloc[0]["player_rating"]
        # tolerance: python round() is banker's, Spark round is HALF_UP
        assert abs(r["avg_opponent_rating"] - grp["opponent_rating"].mean()) < 0.006
        assert r["min_date"] == grp["date"].min().strftime("%Y-%m-%d")
        assert r["max_date"] == grp["date"].max().strftime("%Y-%m-%d")
        assert r["total_games"] == len(grp)


def test_last3_tournaments_matches_pandas(games, golden_pdf):
    got = G.last3_tournaments(games).collect()
    by_fid: dict[str, list] = {}
    for r in got:
        by_fid.setdefault(r["fide_id"], []).append(r)
    pdf = golden_pdf.copy()
    pdf["result"] = pdf["result"].astype(float)
    pdf["opponent_rating"] = pd.to_numeric(pdf["opponent_rating"])
    for fid, grp in pdf.groupby("fide_id"):
        # ui/streamlit_ui.py:164-187
        summary = (
            grp.groupby(["tournament_name", "date"])
            .agg(avg=("opponent_rating", "mean"), pts=("result", "sum"),
                 n=("result", "count"))
            .reset_index()
            .sort_values("date", ascending=False)
            .head(3)
        )
        rows = by_fid[fid]
        assert len(rows) == len(summary)
        for r, (_, e) in zip(rows, summary.iterrows()):
            assert r["date"].strftime("%Y-%m-%d") == e["date"]
            assert r["avg_opponent_rating"] == int(e["avg"])
            exp_str = (
                f"{e['pts']:.0f}" if float(e["pts"]).is_integer() else f"{e['pts']}"
            ) + f"/{e['n']}"
            assert r["tournament_result"] == exp_str


def test_performance_pies_match_pandas(games, golden_pdf):
    got = {r["fide_id"]: r for r in G.performance_pies(games).collect()}
    pdf = golden_pdf.copy()
    pdf["result"] = pdf["result"].astype(float)
    for fid, g in pdf.groupby("fide_id"):
        r = got[fid]
        assert r["win_count"] == (g["result"] == 1.0).sum()
        assert r["draw_count"] == (g["result"] == 0.5).sum()
        assert r["loss_count"] == (g["result"] == 0.0).sum()
        w = g[g["player_color"] == "white"]
        assert r["win_white"] == (w["result"] == 1.0).sum()
        assert r["loss_white"] == (w["result"] == 0.0).sum()
        b = g[g["player_color"] == "black"]
        assert r["draw_black"] == (b["result"] == 0.5).sum()


def test_filtered_history_substring(games, golden_pdf):
    got = G.filtered_history(games, results=[1.0], opponent_substr="  An  ").collect()
    pdf = golden_pdf.copy()
    pdf["result"] = pdf["result"].astype(float)
    exp = pdf[(pdf["result"] == 1.0) & pdf["opponent_name"].str.lower().str.contains("an")]
    assert len(got) == len(exp)


def test_perf_lookup_table_shape():
    assert len(DP_TABLE) == 80  # 17 + 19 + 21 + 23 (full 0.5-step grids)
    for n in (8, 9, 10, 11):
        pts = [p for (g, p, _) in DP_TABLE if g == n]
        assert pts == [x / 2 for x in range(2 * n + 1)], f"grid broken for n={n}"


def test_performance_rating_matches_pickles(spark):
    """Every pickle row with n ∈ {8..11} must reproduce Performance
    Rating exactly through the broadcast-lookup operator."""
    rows = []
    for path in PICKLES:
        pdf = pd.read_pickle(path)
        for _, r in pdf.iterrows():
            n = int(r["Number of Games"])
            if n in (8, 9, 10, 11):
                rows.append(
                    (
                        n,
                        float(r["Points"]),
                        int(r["Opponents Average Rating"]),
                        int(r["Performance Rating"]),
                    )
                )
    assert len(rows) >= 50, "not enough lookup-path rows in the pickles"
    df = spark.createDataFrame(
        rows, "n_games int, points double, opp_avg_rating int, expected int"
    ).withColumn("rating_sum", F.lit(0)).withColumn("wins", F.lit(0.0)).withColumn(
        "losses", F.lit(0.0)
    )
    out = with_performance_rating(df).collect()
    bad = [r for r in out if r["performance_rating"] != r["expected"]]
    assert not bad, f"{len(bad)} mismatches, e.g. {bad[:3]}"


def test_performance_rating_formula_fallback(spark):
    df = spark.createDataFrame(
        [(5, 3.0, 2400, 12000, 3.0, 0.0), (0, 0.0, 0, 0, 0.0, 0.0)],
        "n_games int, points double, opp_avg_rating int, rating_sum int, "
        "wins double, losses double",
    )
    got = {r["n_games"]: r["performance_rating"]
           for r in with_performance_rating(df).collect()}
    assert got[5] == round((12000 + 400 * 3.0) / 5)
    assert got[0] == 0


def test_result_distribution_sums_to_100(games):
    agg = (
        G.result_distribution(games)
        .groupBy("fide_id")
        .agg(F.round(F.sum("pct"), 2).alias("tot"))
        .collect()
    )
    assert all(abs(r["tot"] - 100.0) < 0.02 for r in agg)
