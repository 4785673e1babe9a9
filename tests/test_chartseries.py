"""M4 chart-series downsample vs a pandas replay of the definition,
plus the reference plot-input series (numeric coerce → drop → order)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from fide_crawler_spark.operators.chartseries import m4_downsample, series_points


def _mk_rows():
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # two keys, values chosen so per-bucket first/last/min/max all differ
    for uid in (1, 2):
        for day in range(3):
            for k, v in enumerate([5.0, 1.0, 9.0, 3.0]):
                rows.append(
                    (eid, base + dt.timedelta(days=day, hours=k * 3), uid,
                     v * (uid + day))
                )
                eid += 1
    rows.append((eid, base, 3, None))  # NULL value: dropped (coerce)
    return rows


def test_m4_matches_pandas_replay(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r["user_id"], r["bucket"]): (
            r["n"], r["first_v"], r["last_v"], r["min_v"], r["max_v"],
            r["bucket_start"],
        )
        for r in m4_downsample(
            df, ["user_id"], "ts", "value", 86400, tiebreak_col="event_id"
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf = pdf[pdf.value.notna()]
    pdf["bucket"] = (pdf.ts.astype("int64") // 10**9) // 86400
    want = {}
    for (uid, b), g in pdf.groupby(["user_id", "bucket"]):
        g = g.sort_values(["ts", "event_id"])
        want[(uid, b)] = (
            len(g), g.value.iloc[0], g.value.iloc[-1],
            g.value.min(), g.value.max(), b * 86400,
        )
    assert got == want
    assert not any(uid == 3 for uid, _ in got)  # NULL row dropped


def test_m4_duplicate_timestamps_deterministic(spark):
    """Two points share a timestamp inside one bucket: the tiebreak
    column (not partitioning) decides first/last."""
    t = dt.datetime(2024, 1, 1, 12)
    rows = [(1, t, 7, 100.0), (2, t, 7, 200.0), (3, t, 7, 150.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).repartition(8)
    for _ in range(3):
        r = m4_downsample(
            df, ["user_id"], "ts", "value", 3600, tiebreak_col="event_id"
        ).collect()[0]
        assert (r["first_v"], r["last_v"], r["min_v"], r["max_v"]) == (
            100.0, 150.0, 100.0, 200.0
        )


def test_series_points_is_reference_plot_input(spark):
    """visualization.py:7-9 — to_numeric(errors='coerce'), drop, sort."""
    rows = [
        (1, dt.datetime(2024, 1, 2), "2650"),
        (1, dt.datetime(2024, 1, 1), "2600"),
        (1, dt.datetime(2024, 1, 3), "n/a"),   # coerce -> NULL -> dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, v string")
    got = [
        (r["ts"], r["v"])
        for r in series_points(df, ["user_id"], "ts", "v").collect()
    ]
    assert got == [
        (dt.datetime(2024, 1, 1), 2600.0),
        (dt.datetime(2024, 1, 2), 2650.0),
    ]
