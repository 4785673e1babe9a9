"""As-of and range joins — time-series operators Spark lacks natively.

Beyond-the-reference operators (the reference's pandas analog is the
elo-evolution date alignment in ``ui/streamlit_ui.py:136-138``), built
as compositions of existing DataFrame ops so Catalyst plans them:

* **as-of join** (``asof_join``): for each left row, the latest right
  row with ``right_ts ≤ left_ts`` for the same key — the union+window
  form: one shuffle by key, no per-row Python, no cross join.  This is
  how kdb/pandas ``merge_asof`` semantics map onto Spark.
* **range join** (``range_join_binned``): point-in-interval matching
  without the BroadcastNestedLoopJoin that a raw
  ``BETWEEN``-condition join plans when intervals aren't broadcastable:
  intervals explode into fixed-width bins, points join their bin
  equi-wise, then the exact predicate filters — O(|points| + |intervals|
  × width/bin) shuffled rows instead of |points| × |intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_sec: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: attach to each left row the value columns of
    the latest right row whose ``right_ts`` ≤ ``left_ts`` within the
    same ``on`` key (null when no prior right row exists — LEFT ASOF
    semantics).

    Contract: right rows must be unique per (key, right_ts).  With
    duplicate (key, ts) right rows the window order ties and which
    payload wins is unspecified (it follows partition-internal row
    order, which differs across engines and runs) — pre-aggregate the
    right side (e.g. ``groupBy(key, ts).agg(max_by(...))``) when the
    source can carry duplicates.

    Plan shape: union of the two inputs + ONE window shuffled by key,
    ordered by (ts, side).  The right row's payload travels as a single
    non-null struct so genuinely-null value columns don't fall through
    to older rows.  Scales with the key cardinality (per-user windows),
    never a global window.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    # fail fast on name collisions that would otherwise yield
    # duplicate/ambiguous output columns: the three internal columns,
    # and the suffixed output aliases vs existing left columns
    internal = {"__t", "__side", "__match", "__payload"}
    clash = internal & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    out_clash = {c + suffix for c in value_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"asof_join output alias collides with left columns "
            f"{sorted(out_clash)} — pass a different suffix"
        )
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    # a NULL key or NULL ts never matches in SQL ASOF / merge_asof
    # semantics — without this filter a null-ts right row would sort
    # first in the window and hand its payload to every left row
    not_null = F.col(right_ts).isNotNull()
    for k in on:
        not_null = not_null & F.col(k).isNotNull()
    r = right.filter(not_null).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left.columns if c not in on],
    )
    # a right row at ts == left ts sorts FIRST (side 0 < 1) → inclusive
    # "≤" semantics, matching ASOF JOIN's l.ts >= r.ts
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_sec is not None:
        # microsecond precision: cast('long') floors away sub-second
        # fractions, which would widen the tolerance boundary by up to
        # ~1 s vs merge_asof
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        age = us(F.col("__t")) - us(F.col("__match.__rts"))
        matched = matched.withColumn(
            "__match",
            F.when(age <= int(tolerance_sec) * 1_000_000, F.col("__match")),
        )
    out_cols = [*on, *[c for c in left.columns if c not in on]]
    return matched.select(
        *out_cols,
        *[F.col(f"__match.{c}").alias(c + suffix) for c in value_cols],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int = 86400,
) -> DataFrame:
    """Point-in-interval join without a nested-loop plan: each interval
    explodes into the fixed-width bins it covers, points join their own
    bin equi-wise, and the exact BETWEEN predicate filters the edges.

    A point's bin appears at most once per interval, so no dedup is
    needed.  Shuffle volume is |points| + Σ interval_width/bin — choose
    ``bin_seconds`` near the median interval width so most intervals
    explode into O(1) bins.
    """
    # date / TIMESTAMP_NTZ columns only cast to long via timestamp
    secs = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    p_bin = F.floor(secs(point_col) / bin_seconds)
    i_bins = F.explode(
        F.sequence(
            F.floor(secs(lo_col) / bin_seconds),
            F.floor(secs(hi_col) / bin_seconds),
        )
    )
    p = points.withColumn("__bin", p_bin)
    # an inverted interval (lo > hi, e.g. a data glitch) can never
    # match, but F.sequence would explode it into a DESCENDING bin walk
    # (default step −1) and shuffle every one of those rows for nothing
    i = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "__bin", i_bins
    )
    return (
        p.join(i, "__bin")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bin")
    )
