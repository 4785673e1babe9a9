"""Export surfaces (worksheet CSV / SQLite .db / JSON config) and the
DGT best-match enrichment vs a pure-Python replay of the reference
loop's semantics."""

from __future__ import annotations

import csv
import glob
import json
import os
import sqlite3

import pytest

from fide_crawler_spark.operators.enrich import (
    EVENT_PREFIXES,
    best_match_enrich,
    clean_event_link,
)
from fide_crawler_spark.sources.export import (
    load_localization,
    sqlite_export,
    worksheet_export,
)

LOCALIZATION_JSON = "/root/reference/localization/localization.json"


# ---------------------------------------------------------------- sqlite


def test_sqlite_export_roundtrip(spark, tmp_path):
    db = str(tmp_path / "out.db")
    games = spark.createDataFrame(
        [(1, "Open A", 2650.5, None), (2, "Open B", 2700.0, "w")],
        "id long, tournament string, rating double, result string",
    )
    counts = sqlite_export({"game_history": games, "empty": games.limit(0)}, db)
    assert counts == {"game_history": 2, "empty": 0}
    with sqlite3.connect(db) as con:
        rows = con.execute(
            "SELECT id, tournament, rating, result FROM game_history ORDER BY id"
        ).fetchall()
        assert rows == [(1, "Open A", 2650.5, None), (2, "Open B", 2700.0, "w")]
        types = {
            r[1]: r[2]
            for r in con.execute("PRAGMA table_info(game_history)").fetchall()
        }
        assert types == {
            "id": "INTEGER",
            "tournament": "TEXT",
            "rating": "REAL",
            "result": "TEXT",
        }


def test_sqlite_export_refuses_unbounded(spark, tmp_path):
    big = spark.range(100)
    with pytest.raises(ValueError, match="max_rows_per_table"):
        sqlite_export({"facts": big}, str(tmp_path / "x.db"), max_rows_per_table=10)


def test_sqlite_export_nested_values_json_encoded(spark, tmp_path):
    db = str(tmp_path / "nested.db")
    df = spark.createDataFrame(
        [(1, ["a", "b"], {"k": 2}, (3, "x"), bytearray(b"\x01\xff"),
          {"deep": (7, "y")})],
        "id long, arr array<string>, m map<string,int>, "
        "s struct<a:int,b:string>, blob binary, "
        "ms map<string,struct<a:int,b:string>>",
    )
    sqlite_export({"t": df}, db)
    with sqlite3.connect(db) as con:
        row = con.execute("SELECT arr, m, s, blob, ms FROM t").fetchone()
    assert json.loads(row[0]) == ["a", "b"]
    assert json.loads(row[1]) == {"k": 2}
    assert json.loads(row[2]) == {"a": 3, "b": "x"}
    assert row[3] == "01ff"
    assert json.loads(row[4]) == {"deep": {"a": 7, "b": "y"}}


def test_sqlite_export_failure_leaves_no_partial_db(spark, tmp_path):
    """The max_rows guard firing on the SECOND table must not leave a
    half-written .db (or .tmp) at the target path — atomic
    temp+rename only publishes on full success."""
    db = str(tmp_path / "atomic.db")
    ok = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="max_rows_per_table"):
        sqlite_export(
            {"small": ok, "big": spark.range(100)}, db, max_rows_per_table=10
        )
    assert not os.path.exists(db)
    assert not os.path.exists(db + ".tmp")
    # a later successful export to the same path works
    assert sqlite_export({"small": ok}, db) == {"small": 1}
    assert os.path.exists(db)


# ------------------------------------------------------------- worksheet


def test_worksheet_export_layout_and_order(spark, tmp_path):
    out = str(tmp_path / "sheets")
    df = spark.createDataFrame(
        [("alice", 3, "c"), ("bob", 1, "a"), ("alice", 1, "a"), ("alice", 2, "b")],
        "player string, round long, res string",
    )
    worksheet_export(df, out, sheet_col="player", order_by=["round"])
    sheets = sorted(os.path.basename(p) for p in glob.glob(f"{out}/player=*"))
    assert sheets == ["player=alice", "player=bob"]
    files = glob.glob(f"{out}/player=alice/*.csv")
    assert len(files) == 1  # one worksheet file per key
    with open(files[0]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["round", "res"]  # header row, sheet col lifted to dir
    assert [r[0] for r in rows[1:]] == ["1", "2", "3"]  # deterministic order
    # re-run = clear + rewrite (reference worksheet.clear())
    worksheet_export(df.filter("player = 'bob'"), out, "player", ["round"])
    assert sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/player=*")
    ) == ["player=bob"]


# ---------------------------------------------------------------- config


def test_load_localization_matches_json(spark):
    ref = json.load(open(LOCALIZATION_JSON, encoding="utf-8"))
    df = load_localization(spark, LOCALIZATION_JSON)
    got = {(r["lang"], r["key"]): r["text"] for r in df.collect()}
    want = {
        (lang, key): text
        for lang, kv in ref.items()
        for key, text in kv.items()
    }
    assert got == want
    # broadcast-join-ready: one row per (lang, key)
    assert len(got) == df.count()


# ---------------------------------------------------------------- enrich


def _lev(a: str, b: str) -> int:
    # Wagner-Fischer edit distance (unit costs)
    lb = len(b)
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * lb
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[lb]


def _lcs(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def _ratio(a: str, b: str, scorer: str = "exact") -> float:
    tot = len(a) + len(b)
    if scorer == "exact":
        # true python-Levenshtein lev.ratio: 2*LCS/(la+lb)
        return 2.0 * _lcs(a, b) / tot if tot else 1.0
    # the JVM approximation: (la+lb-2*lev)/(la+lb)
    return (tot - 2 * _lev(a, b)) / tot


def _py_best_match(tournaments, results, scorer: str = "exact"):
    out = {}
    for t in tournaments:
        text = t.lower()
        dgt, title, link, max_ratio = 0, "", "", 0.0
        for pos, (rlink, rtitle) in enumerate(results):
            slug = None
            for p in EVENT_PREFIXES:
                if rlink.startswith(p):
                    slug = rlink[len(p):].replace("-", " ")
                    break
            if slug is None:
                continue
            r = _ratio(text, slug, scorer)
            if r > max_ratio:  # strict: first max wins ties
                dgt, title, link, max_ratio = 1, rtitle, rlink, r
        out[t] = (dgt, title, link, round(max_ratio, 4))
    return out


def test_clean_event_link_prefixes(spark):
    from pyspark.sql import functions as F

    links = [(p + "tata-steel-2024",) for p in EVENT_PREFIXES] + [
        ("https://example.com/tata-steel-2024",),
        ("https://www.chess.com/eventsish/nope",),
    ]
    df = spark.createDataFrame(links, "link string")
    got = [
        r["slug"]
        for r in df.select(
            clean_event_link(F.col("link")).alias("slug")
        ).collect()
    ]
    assert got == ["tata steel 2024"] * len(EVENT_PREFIXES) + [None, None]


def test_best_match_enrich_matches_python_loop(spark):
    tournaments = [
        "Tata Steel 2024",
        "candidates 2024",
        "Completely Unrelated Zzz Qqq",
    ]
    results = [
        ("https://www.chess.com/events/tata-steel-2024", "Tata Steel Chess"),
        ("https://lichess.org/broadcast/tata-steel-2024", "Tata on Lichess"),
        ("https://example.com/tata-steel-2024", "not an event site"),
        ("https://lichess.org/broadcast/candidates-2024", "Candidates"),
    ]
    facts = spark.createDataFrame(
        [(t,) for t in tournaments], "tournament_name string"
    )
    catalog = spark.createDataFrame(
        [(link, title, pos) for pos, (link, title) in enumerate(results)],
        "link string, title string, pos long",
    )
    for scorer in ("exact", "fast"):
        got = {
            r["tournament_name"]: (
                r["dgt"],
                r["dgt_title"],
                r["dgt_link"],
                round(r["dgt_accuracy"], 4),
            )
            for r in best_match_enrich(facts, catalog, scorer=scorer).collect()
        }
        want = _py_best_match(tournaments, results, scorer)
        assert got == want, scorer
        # the tie case: chess.com and lichess links clean to the SAME
        # slug with equal ratios — the earlier result (pos 0) must win
        assert got["Tata Steel 2024"][2] == results[0][0]


def test_best_match_exact_scorer_ranks_indel_pairs_like_reference(spark):
    """The case the fast scorer gets WRONG (ADVICE r4): when optimal
    alignments differ in indel count, (la+lb-2*lev)/(la+lb) under-scores
    and can pick a different winner than the reference's lev.ratio.
    key='ab': candidate 'axxxb' has lev.ratio 2*LCS/(2+5)=4/7 but fast
    ratio (7-6)/7=1/7; candidate 'zb' scores 0.5 under both.  The
    default exact scorer must rank 'axxxb' first (reference behavior);
    fast demonstrably flips to 'zb'."""
    facts = spark.createDataFrame([("ab",)], "tournament_name string")
    catalog = spark.createDataFrame(
        [
            ("https://lichess.org/broadcast/axxxb", "indel-winner", 0),
            ("https://lichess.org/broadcast/zb", "sub-winner", 1),
        ],
        "link string, title string, pos long",
    )
    exact = best_match_enrich(facts, catalog).first()
    assert exact["dgt_title"] == "indel-winner"
    assert round(exact["dgt_accuracy"], 4) == round(4 / 7, 4)
    fast = best_match_enrich(facts, catalog, scorer="fast").first()
    assert fast["dgt_title"] == "sub-winner"  # the documented divergence


# ------------------------------------------------------- driver window


def test_driver_window_covers_never_checked_entries():
    """The driver's correctness harness records only the FIRST 50
    entries of queries(); the round-5 rotation in __spark_entry__ must
    put the round-4/5 additions q69-q83 (the only entries with no driver
    row in any round) plus the r3-era veterans due a refresh inside
    that window, alongside the continuity anchors.  The only window
    entries without a SQL oracle are the genuinely non-SQL-expressible
    ones (q35 crawl pipeline, q47 seed search) — q66's zlib query is
    rotated out this round, and q32 IVF ANN gained a full unrolled
    DuckDB oracle in round 5 (queries._ivf_oracle_sql)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = list(mod.queries())
    window = set(names[:50])
    for n in mod._ANCHORS:
        assert n in window, f"anchor {n} fell out of the driver window"
    never_checked = {
        n for n in names
        if n[0] == "q" and n[1:3].isdigit() and 69 <= int(n[1:3]) <= 83
    }
    assert len(never_checked) == 15
    assert never_checked <= window, never_checked - window
    refresh = set(mod._REFRESH)
    assert len(refresh) == 19
    assert refresh <= window, refresh - window
    oracled = set(mod.oracle_sql())
    assert window - oracled == {
        "q35_crawl_to_analytics", "q47_seed_search"
    }
