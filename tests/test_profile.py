"""Player-profile pipeline (SURVEY A2/J-2) and seed-search stage.

Three oracles:
* a pure-Python sequential oracle (fixtures.parse_profile_page over
  render_profile_page — same invariant style as the span pipeline);
* the golden ``player_data`` table in the reference's fide_data.db
  (schema + upsert semantics parity);
* DuckDB value oracles live in test_queries_oracle (q45/q46).
"""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fide_crawler_spark import fixtures as FX
from fide_crawler_spark.operators import profile as P
from fide_crawler_spark.operators.frontier import canonicalize_profile_urls
from fide_crawler_spark.sources.snapshot import SnapshotTable

DB = "/root/reference/database/fide_data.db"

GOLDEN_COLS = [
    "fide_id", "name", "federation", "b_year", "sex", "fide_title",
    "std_rating", "rapid_rating", "blitz_rating", "profile_photo",
    "world_rank",
]


def sequential_profiles(fide_ids: list[str]) -> list[dict]:
    """The reference's loop shape: fetch+parse one profile at a time
    (fetch_player_data, data_fetching_processing.py:118-120)."""
    return [
        FX.parse_profile_page(fid, FX.render_profile_page(fid))
        for fid in fide_ids
    ]


def test_schema_matches_golden_player_data():
    """Our record layout is column-for-column the reference's
    player_data table (database_management.py:8-24)."""
    with sqlite3.connect(DB) as con:
        cur = con.execute("SELECT * FROM player_data")
        golden_cols = [d[0] for d in cur.description]
        n = len(cur.fetchall())
    assert sorted(P.PROFILE_SCHEMA.split(", ")) == sorted(
        f"{c} string" for c in golden_cols
    )
    assert n == 4  # the golden DB ships 4 profiles


def test_parse_roundtrip_equals_synth():
    """parse(render(id)) == synth_profile(id), including the
    safe-extract '' defaults for omitted markup."""
    for fid in ["1503014", "2093596", "35", "1000000", "7", "2020009"]:
        got = FX.parse_profile_page(fid, FX.render_profile_page(fid))
        assert got == FX.synth_profile(fid), fid


def test_parse_handles_missing_markup():
    """A page with no recognizable markup yields '' everywhere except
    the caller-supplied id (safe_extract default,
    data_fetching_processing.py:80-85)."""
    got = FX.parse_profile_page("42", "<html><body>junk</body></html>")
    assert got["fide_id"] == "42"
    assert all(got[k] == "" for k in FX.PROFILE_FIELDS if k != "fide_id")


def test_spark_stage_equals_sequential_oracle(spark):
    ids = [str(1000000 + 7 * i) for i in range(40)]
    df = spark.createDataFrame([{"fide_id": f} for f in ids])
    got = {
        r["fide_id"]: r.asDict()
        for r in P.profiles_for_ids(spark, df).collect()
    }
    for rec in sequential_profiles(ids):
        assert got[rec["fide_id"]] == rec


def test_upsert_merges_on_fide_id(spark, tmp_path):
    """A9 MERGE semantics: second upsert replaces matching ids, keeps
    the rest, never duplicates the primary key."""
    t = SnapshotTable(str(tmp_path / "player_data"))
    ids1 = spark.createDataFrame([{"fide_id": str(i)} for i in (10, 11, 12)])
    P.upsert_profiles(t, spark, P.profiles_for_ids(spark, ids1))
    ids2 = spark.createDataFrame([{"fide_id": str(i)} for i in (12, 13)])
    P.upsert_profiles(t, spark, P.profiles_for_ids(spark, ids2))

    cur = t.read(spark)
    assert cur.count() == 4
    assert cur.select("fide_id").distinct().count() == 4
    rec = cur.filter(F.col("fide_id") == "12").first().asDict()
    assert rec == FX.synth_profile("12")


def test_golden_profiles_survive_upsert_roundtrip(spark, tmp_path):
    """The actual golden rows flow through the same table machinery
    bit-for-bit (TEXT in, TEXT out)."""
    with sqlite3.connect(DB) as con:
        pdf = pd.read_sql("SELECT * FROM player_data", con).astype(str)
    t = SnapshotTable(str(tmp_path / "player_data"))
    P.upsert_profiles(t, spark, spark.createDataFrame(pdf))
    back = t.read(spark).toPandas().sort_values("fide_id").reset_index(drop=True)
    pdf = pdf.sort_values("fide_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[pdf.columns.tolist()], pdf)


def test_photo_media_feeds_multimodal(spark):
    from fide_crawler_spark.operators.multimodal import decode_media

    ids = spark.createDataFrame([{"fide_id": str(i)} for i in (1, 2, 97, 98)])
    media = P.photo_media_table(P.profiles_for_ids(spark, ids))
    out = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert set(out) == {1, 2, 97, 98}
    # payload is the base64 tail of the data URI: 'p' + (fid % 97)
    assert out[97]["n_bytes"] == len("p0")
    assert out[1]["n_bytes"] == len("p1")
    assert all(len(r["features"]) == 8 for r in out.values())


# --------------------------------------------------------------------------
# seed search (fetch_players, data_fetching_processing.py:30-78)
# --------------------------------------------------------------------------

def sequential_seed_search(query: str) -> list[dict]:
    """Reference fetch_players loop: parse member blocks in document
    order, admit profile-URLs with numeric ids, skip news links."""
    import re

    out = []
    for pos, rec in enumerate(FX.parse_search_page(FX.render_search_page(query))):
        if "profile" not in rec["url"] or "news" in rec["url"]:
            continue
        m = re.search(r"/profile/(\d+)", rec["url"])
        if not m:
            continue
        out.append(
            {
                "fide_id": m.group(1),
                "name": rec["name"],
                "title": rec["title"],
                "seed_pos": pos,
            }
        )
    return out


@pytest.mark.parametrize("query", ["carlsen", "niemann", "x", "smith-jones"])
def test_seed_search_matches_sequential_oracle(spark, query):
    got = [r.asDict() for r in P.seeds_from_query(spark, query).collect()]
    assert got == sequential_seed_search(query)


def test_search_page_exercises_admission(spark):
    """Across a query pool, the synthetic pages must actually contain
    both droppable variants (news links, id-less hrefs) — otherwise the
    admission filter is vacuously tested."""
    queries = [f"q{i}" for i in range(30)]
    all_urls = [
        rec["url"]
        for q in queries
        for rec in FX.parse_search_page(FX.render_search_page(q))
    ]
    assert any("/news/" in u for u in all_urls)
    assert any(u == "/profile/unrated" for u in all_urls)
    df = spark.createDataFrame([{"url": u, "i": i} for i, u in enumerate(all_urls)])
    admitted = canonicalize_profile_urls(df).collect()
    assert 0 < len(admitted) < len(all_urls)
    assert all(r["url"].startswith("https://ratings.fide.com/profile/") for r in admitted)
    assert all(r["fide_id"].isdigit() for r in admitted)
    # passthrough columns survive admission
    assert all("i" in r.asDict() for r in admitted)


def test_seed_search_feeds_crawl_seed_rows(spark):
    """Entry-stage wiring: search output plugs straight into
    seed_frontier_rows / seed_frontier (same columns the scheduler
    expects: fide_id + seed_pos order)."""
    seeds = P.seeds_from_query(spark, "carlsen").collect()
    rows = FX.seed_frontier_rows([s["fide_id"] for s in seeds], "2023-01-01", 2)
    assert len(rows) == 2 * len(seeds)
    # crawl order preserves search-result order
    by_pos = [s["fide_id"] for s in sorted(seeds, key=lambda s: s["seed_pos"])]
    assert [r["fide_id"] for r in rows[::2]] == by_pos
