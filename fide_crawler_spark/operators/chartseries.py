"""Chart-series data planes — the engine-side half of the reference's
plots (SURVEY §2 J-6).

Reference behavior being reproduced (/root/reference/):

* ``visualizations/visualization.py:5-19`` — rating time series:
  ``pd.to_numeric(errors='coerce')`` + ``sort_values('date')`` feeding
  ``plt.plot``.  The pixels are presentation scope; the DATA the plot
  consumes is engine scope: a date-ordered numeric series per player.
* ``visualization.py:24-36`` (pie) and ``:39-54`` (bar) consume
  value-counts and conditional means — already first-class catalog
  entries (q13 value counts, q2 conditional slices).

At 100 TB a per-player series can be 10^6+ points — far more than any
chart can render.  The scalable form of the time-series data plane is
**M4 downsampling** (Jugel et al., VLDB 2014): bucket the series by
time, keep per bucket the first / last / min / max points.  For a line
chart rendered at w pixels, M4 with w buckets is error-free (every
pixel column's extrema survive), and unlike LTTB it is a pure grouped
aggregate — no sequential dependency on previously selected points, so
it parallelizes as one shuffle-free-after-scan groupBy and never
funnels a series through a single task.

Determinism: extrema are taken over lexicographic (ts, tiebreak, value)
structs, so duplicate timestamps or values cannot make the output
depend on partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    bucket_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per (key, time-bucket) M4 aggregate of a numeric series.

    Returns one row per (key, bucket):
      ``n`` points, ``first_v``/``last_v`` (value at the bucket's
      earliest/latest timestamp), ``min_v``/``max_v``, and
      ``bucket_start`` (epoch seconds).  Rows with NULL values are
      dropped first — the relational form of the reference's
      ``to_numeric(errors='coerce')`` feeding a line plot.

    One scan + one grouped aggregate: partial (map-side) aggregation
    applies, so a 10^10-point table reduces to |keys| × |buckets| rows
    without any per-key window.  Struct extrema are not
    hash-aggregable, so Spark plans a SortAggregate — still
    partial+final around a single exchange (pinned by
    tests/test_plans.py); the per-partition sort is on (key, bucket),
    never a global or per-key-total order.
    """
    # parquet timestamps read as TIMESTAMP_NTZ, which has no direct
    # numeric cast — route via TIMESTAMP (session TZ is UTC), keeping
    # sub-second precision
    ts_sec = F.col(ts_col).cast("timestamp").cast("double")
    bucket = F.floor(ts_sec / F.lit(bucket_seconds)).cast("long")
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    point = F.struct(
        F.col(ts_col).alias("ts"), tb.alias("tb"), F.col(val_col).alias("v")
    )
    return (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(*key_cols, bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(point).alias("_first"),
            F.max(point).alias("_last"),
            F.min(val_col).alias("min_v"),
            F.max(val_col).alias("max_v"),
        )
        .select(
            *key_cols,
            "bucket",
            (F.col("bucket") * bucket_seconds).alias("bucket_start"),
            "n",
            F.col("_first.v").alias("first_v"),
            F.col("_last.v").alias("last_v"),
            "min_v",
            "max_v",
        )
    )


def series_points(df: DataFrame, key_cols: list[str], ts_col: str,
                  val_col: str) -> DataFrame:
    """The un-downsampled chart input: numeric-coerced, NULL-dropped,
    date-ordered series (visualization.py:7-9 exactly) — for series
    small enough to plot raw.  ``orderBy`` is a total sort, fine for
    one player's history; use :func:`m4_downsample` beyond that."""
    return (
        df.select(
            *key_cols, ts_col,
            # try_cast, not cast: ANSI mode would throw on non-numeric
            # strings; the reference's to_numeric(errors='coerce')
            # maps them to NULL, dropped next
            F.col(val_col).try_cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .orderBy(*key_cols, ts_col)
    )
