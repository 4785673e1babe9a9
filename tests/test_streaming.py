"""Streaming results must equal the batch computation on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from fide_crawler_spark.queries import QUERIES
from fide_crawler_spark.streaming.pipeline import (
    read_events_stream,
    run_to_memory,
    running_totals_stateful,
    windowed_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_to_memory(windowed_counts(stream), "win_out", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["q28_tumbling_window"](spark, sf_dir).collect()
    }
    assert got == expect


def test_stateful_running_totals_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_to_memory(running_totals_stateful(stream), "state_out", output_mode="update")
    # last update per user is the final running total
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM state_out").collect()
    }
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .collect()
    )
    for r in batch:
        n, total = got[r["user_id"]]
        assert n == r["n"]
        assert abs(total - r["total"]) < 1e-6


def test_stream_dedup_across_microbatches(spark, sf_dir, tmp_path):
    """Duplicates arriving in LATER micro-batches are dropped by the
    watermark-bounded state: two identical files -> two micro-batches;
    output equals the batch distinct of one copy."""
    import os

    from fide_crawler_spark.streaming.pipeline import (
        dedup_stream,
        read_events_stream,
        run_to_memory,
    )

    batch = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .orderBy("event_id")
        .limit(300)
    )
    d = str(tmp_path / "dup_events")
    batch.coalesce(1).write.mode("overwrite").parquet(d)
    # second identical file = a later micro-batch full of duplicates
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    import shutil

    shutil.copy(os.path.join(d, files[0]), os.path.join(d, "copy_" + files[0]))

    stream = read_events_stream(spark, d, max_files=1)
    run_to_memory(
        dedup_stream(stream), "dedup_stream_t", output_mode="append"
    )
    got = spark.sql(
        "SELECT event_id FROM dedup_stream_t ORDER BY event_id"
    ).collect()
    want = batch.select("event_id").distinct().orderBy("event_id").collect()
    assert [r["event_id"] for r in got] == [r["event_id"] for r in want]


def test_session_window_stream_equals_batch(spark, sf_dir):
    import os

    from fide_crawler_spark.streaming.pipeline import (
        read_events_stream,
        run_to_memory,
        session_counts,
    )

    path = os.path.join(sf_dir, "events.parquet")
    batch = session_counts(spark.read.parquet(path))
    run_to_memory(
        session_counts(read_events_stream(spark, path)),
        "session_stream_t",
        output_mode="complete",
    )
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    got = [tuple(r) for r in spark.sql(
        "SELECT user_id, session_start, session_end, n_events, sum_value "
        "FROM session_stream_t ORDER BY user_id, session_start"
    ).collect()]
    want = [tuple(r) for r in batch.select(*cols).orderBy(
        "user_id", "session_start"
    ).collect()]
    assert got == want and len(got) > 0
