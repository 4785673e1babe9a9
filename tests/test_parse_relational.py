"""Relational spans→game_history parse vs a pure-Python derivation.

The Spark path is pure relational algebra (running-sum block ids,
row_number positional slices, offset+1 media join — parse.py
game_history_view); the oracle below walks the span list sequentially
the way the reference walks the page (data_fetching_processing.py:
148-194)."""

from __future__ import annotations

import pytest

from fide_crawler_spark.fixtures import calc_url, synth_spans
from fide_crawler_spark.operators.parse import game_history_view

URLS = [calc_url(str(1000000 + i), f"2023-{m:02d}-01") for i in range(4) for m in (1, 2, 3)]


def oracle_games(url: str) -> list[dict]:
    spans = synth_spans(url)
    fide_id = url.split("id_number=")[1].split("&")[0]
    games, block, rows = [], [], []
    blocks = []
    for s in spans:
        if s.kind == "text" and s.text == "":
            blocks.append(block)
            block = []
        else:
            block.append(s)
    blocks.append(block)
    for block in blocks:
        texts = [s for s in block if s.kind == "text"]
        media = {s.offset: s.media_ref for s in block if s.kind == "media"}
        tname, tdate, country, prating = (t.text for t in texts[:4])
        for g in texts[4:]:
            f = g.text.split("\t")
            games.append(
                {
                    "fide_id": fide_id,
                    "tournament_name": tname,
                    "date": tdate,
                    "country": country,
                    "player_rating": int(prating),
                    "player_color": (
                        "white" if "clr_wh" in media[g.offset + 1] else "black"
                    ),
                    "opponent_name": f[0],
                    "opponent_rating": int(f[2]),
                    "result": float(f[3]),
                    "chg": float(f[4]),
                    "k": int(f[5]),
                    "k_chg": float(f[6]),
                    "offset": g.offset,
                }
            )
    return games


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        {
            "doc_id": u,
            "spans": [
                {"kind": s.kind, "text": s.text, "media_ref": s.media_ref,
                 "offset": s.offset}
                for s in synth_spans(u)
            ],
        }
        for u in URLS
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_game_history_view_matches_oracle(docs):
    got = game_history_view(docs).collect()
    expected = {}
    for u in URLS:
        for g in oracle_games(u):
            expected[(u, g["offset"])] = g
    assert len(got) == len(expected)
    for r in got:
        e = expected[(r["doc_id"], r["offset"])]
        assert r["tournament_name"] == e["tournament_name"]
        assert r["date"].strftime("%Y-%m-%d") == e["date"]
        assert r["country"] == e["country"]
        assert r["player_rating"] == e["player_rating"]
        assert r["player_color"] == e["player_color"]
        assert r["opponent_name"] == e["opponent_name"]
        assert r["opponent_rating"] == e["opponent_rating"]
        assert r["result"] == e["result"]
        assert r["chg"] == e["chg"]
        assert r["k"] == e["k"]
        assert r["k_chg"] == e["k_chg"]
        assert r["fide_id"] == e["fide_id"]
