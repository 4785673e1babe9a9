"""As-of / range join operators vs independent oracles.

pandas.merge_asof is the as-of oracle (third engine, independent of
both Spark and DuckDB); the range join is checked against the naive
BETWEEN-condition join on the same Spark session.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from fide_crawler_spark.operators.asof import asof_join, range_join_binned


def _frames():
    left = pd.DataFrame(
        {
            "k": [i % 5 for i in range(200)],
            "ts": pd.to_datetime("2023-01-01")
            + pd.to_timedelta([(i * 37) % 1000 for i in range(200)], unit="m"),
            "x": [float(i) for i in range(200)],
        }
    )
    right = pd.DataFrame(
        {
            "k": [i % 5 for i in range(60)],
            "ts": pd.to_datetime("2023-01-01")
            + pd.to_timedelta([(i * 97) % 900 for i in range(60)], unit="m"),
            "v": [float(100 + i) for i in range(60)],
        }
    ).drop_duplicates(["k", "ts"])
    return left, right


def _expected(left, right, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts", by="k", direction="backward", **kw,
    )
    return {
        (r.k, r.ts, r.x): (None if pd.isna(r.v) else r.v)
        for r in exp.itertuples()
    }


def test_asof_join_matches_pandas_merge_asof(spark):
    left, right = _frames()
    got = {
        (r["k"], pd.Timestamp(r["ts"]), r["x"]): r["v_asof"]
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"], value_cols=["v"],
        ).collect()
    }
    assert got == _expected(left, right)


def test_asof_join_tolerance(spark):
    left, right = _frames()
    got = {
        (r["k"], pd.Timestamp(r["ts"]), r["x"]): r["v_asof"]
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"], value_cols=["v"], tolerance_sec=3600,
        ).collect()
    }
    assert got == _expected(left, right, tolerance=3600)


def test_asof_equal_timestamps_are_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "2023-01-01 10:00:00", 1.0)], "k long, ts string, x double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2023-01-01 10:00:00", 42.0)], "k long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [row] = asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    assert row["v_asof"] == 42.0


def test_asof_null_right_value_does_not_fall_through(spark):
    """A right row whose VALUE is null must still win over an older
    non-null row (the payload struct is the match unit, not the value)."""
    left = spark.createDataFrame(
        [(1, "2023-01-01 12:00:00", 0.0)], "k long, ts string, x double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2023-01-01 10:00:00", 7.0), (1, "2023-01-01 11:00:00", None)],
        "k long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [row] = asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    assert row["v_asof"] is None  # the 11:00 null row, not the 10:00 7.0


def test_range_join_binned_equals_naive(spark):
    left, right = _frames()
    points = spark.createDataFrame(left).select(
        F.col("ts").alias("pt"), "x"
    )
    intervals = spark.createDataFrame(right).select(
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("interval 47 minutes")).alias("hi"),
        F.col("v").alias("interval_id"),
    )
    got = sorted(
        (r["interval_id"], r["x"])
        for r in range_join_binned(
            points, intervals, "pt", "lo", "hi", bin_seconds=600
        ).collect()
    )
    naive = sorted(
        (r["interval_id"], r["x"])
        for r in points.join(
            intervals, F.col("pt").between(F.col("lo"), F.col("hi"))
        ).collect()
    )
    assert got and got == naive


def test_asof_null_ts_and_key_right_rows_never_match(spark):
    """SQL ASOF / merge_asof semantics: a right row with NULL ts (or
    NULL key) matches nothing — it must not sort first in the window
    and leak its payload to every left row."""
    left = spark.createDataFrame(
        [(1, "2023-01-01 10:00:00", 1.0)], "k long, ts string, x double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, None, 9.0), (None, "2023-01-01 09:00:00", 8.0)],
        "k long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [row] = asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    assert row["v_asof"] is None


def test_asof_tolerance_subsecond_boundary(spark):
    """Tolerance is microsecond-exact: an age of 3600.9s must NOT pass
    tolerance_sec=3600 (second-truncated epochs would floor it to
    3600 and keep the match, diverging from merge_asof)."""
    left = spark.createDataFrame(
        [(1, "2023-01-01 11:00:00.9", 0.0)], "k long, ts string, x double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2023-01-01 10:00:00.0", 5.0)], "k long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [row] = asof_join(
        left, right, on=["k"], value_cols=["v"], tolerance_sec=3600
    ).collect()
    assert row["v_asof"] is None
    [row2] = asof_join(
        left, right, on=["k"], value_cols=["v"], tolerance_sec=3601
    ).collect()
    assert row2["v_asof"] == 5.0


def test_range_join_inverted_intervals_are_free(spark):
    """lo > hi intervals must produce zero matches AND zero exploded
    bins (F.sequence would otherwise walk them backwards)."""
    points = spark.createDataFrame(
        [("2023-01-01 12:00:00", 1.0)], "pt string, x double"
    ).withColumn("pt", F.col("pt").cast("timestamp"))
    intervals = spark.createDataFrame(
        [("2023-06-01 00:00:00", "2023-01-01 00:00:00", 1)],
        "lo string, hi string, interval_id long",
    ).withColumn("lo", F.col("lo").cast("timestamp")).withColumn(
        "hi", F.col("hi").cast("timestamp")
    )
    out = range_join_binned(points, intervals, "pt", "lo", "hi")
    assert out.count() == 0


def test_asof_join_rejects_colliding_names(spark):
    """Reserved internal names and suffixed output aliases must fail
    fast instead of yielding duplicate/ambiguous columns."""
    import pytest

    left = spark.createDataFrame(
        [(1, "2023-01-01 00:00:00", 1.0)], "k long, ts string, v_asof double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2023-01-01 00:00:00", 2.0)], "k long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, on=["k"], value_cols=["v"])

    bad_internal = left.withColumnRenamed("v_asof", "__side")
    with pytest.raises(ValueError, match="reserves"):
        asof_join(bad_internal, right, on=["k"], value_cols=["v"])
