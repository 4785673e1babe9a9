"""FIDE performance-rating operator (SURVEY H20).

The reference implements this as a 178-line nested if/elif branch table
(``/root/reference/old_scripts/performanceCalculator.py:9-176``) plus a
formula fallback (``:178``).  The branch table is FIDE's published
dp-lookup *data* for n ∈ {8, 9, 10, 11} games — here it is exactly
that: a small broadcast-joined lookup DataFrame, with the fallback as a
native expression.  No 69-way CASE chain, no Python in the row path.

Fidelity notes (verified against the golden pickles,
``/root/reference/pickles/*.pkl``):

* lookup rows: performance = opponents_avg_rating + delta(n, points);
* fallback:    performance = round((rating_sum + 400*(wins - losses))/n)
  — and in the reference batch path ``totalLosses`` is ALWAYS 0 because
  ``sum([x for x in pointsValues if x == 0])`` sums zeros
  (``old_scripts/fide-games-scraper-public.py:94``); callers that want
  bit-parity with the pickles pass ``losses=F.lit(0.0)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (n_games, points, delta) — transcribed FIDE dp data, 80 rows
DP_TABLE: list[tuple[int, float, int]] = [
    # n = 8
    (8, 0.0, -800), (8, 0.5, -444), (8, 1.0, -322), (8, 1.5, -251), (8, 2.0, -193),
    (8, 2.5, -141), (8, 3.0, -95), (8, 3.5, -43), (8, 4.0, 0), (8, 4.5, 43),
    (8, 5.0, 95), (8, 5.5, 141), (8, 6.0, 193), (8, 6.5, 251), (8, 7.0, 322),
    (8, 7.5, 444), (8, 8.0, 800),
    # n = 9
    (9, 0.0, -800), (9, 0.5, -444), (9, 1.0, -351), (9, 1.5, -273), (9, 2.0, -220),
    (9, 2.5, -166), (9, 3.0, -125), (9, 3.5, -80), (9, 4.0, -43), (9, 4.5, 0),
    (9, 5.0, 43), (9, 5.5, 80), (9, 6.0, 125), (9, 6.5, 166), (9, 7.0, 220),
    (9, 7.5, 273), (9, 8.0, 351), (9, 8.5, 444), (9, 9.0, 800),
    # n = 10
    (10, 0.0, -800), (10, 0.5, -470), (10, 1.0, -366), (10, 1.5, -296), (10, 2.0, -240),
    (10, 2.5, -193), (10, 3.0, -149), (10, 3.5, -110), (10, 4.0, -72), (10, 4.5, -36),
    (10, 5.0, 0), (10, 5.5, 36), (10, 6.0, 72), (10, 6.5, 110), (10, 7.0, 149),
    (10, 7.5, 193), (10, 8.0, 240), (10, 8.5, 296), (10, 9.0, 366), (10, 9.5, 470),
    (10, 10.0, 800),
    # n = 11
    (11, 0.0, -800), (11, 0.5, -470), (11, 1.0, -383), (11, 1.5, -309), (11, 2.0, -262),
    (11, 2.5, -211), (11, 3.0, -175), (11, 3.5, -133), (11, 4.0, -102), (11, 4.5, -65),
    (11, 5.0, -36), (11, 5.5, 0), (11, 6.0, 36), (11, 6.5, 65), (11, 7.0, 102),
    (11, 7.5, 133), (11, 8.0, 175), (11, 8.5, 211), (11, 9.0, 262), (11, 9.5, 309),
    (11, 10.0, 383), (11, 10.5, 470), (11, 11.0, 800),
]


def perf_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DP_TABLE, "n_games int, points double, delta int"
    )


def with_performance_rating(
    df: DataFrame,
    n_games: str = "n_games",
    points: str = "points",
    opp_avg: str = "opp_avg_rating",
    rating_sum: str = "rating_sum",
    wins: str = "wins",
    losses: str = "losses",
    out: str = "performance_rating",
) -> DataFrame:
    """Broadcast-join the dp table on (n_games, points); coalesce to the
    formula fallback for n outside {8..11} (or points off the 0.5 grid).
    """
    spark = df.sparkSession
    lut = F.broadcast(perf_lookup_df(spark))
    joined = df.join(
        lut,
        (df[n_games] == lut["n_games"]) & (df[points] == lut["points"]),
        "left",
    ).drop(lut["n_games"]).drop(lut["points"])
    fallback = F.when(
        F.col(n_games) > 0,
        F.round(
            (F.col(rating_sum) + 400 * (F.col(wins) - F.col(losses)))
            / F.col(n_games)
        ).cast("int"),
    ).otherwise(F.lit(0))
    perf = F.coalesce(F.col(opp_avg) + F.col("delta"), fallback)
    return joined.withColumn(out, perf.cast("int")).drop("delta")
