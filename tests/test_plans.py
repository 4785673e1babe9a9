"""Plan-shape assertions: the queries must not just be right, they must
carry the physical properties we designed for (pushdown, pruning,
broadcast, codegen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fide_crawler_spark.plans import (
    codegen_stage_count,
    count_exchanges,
    has_broadcast_join,
    has_pushed_filter,
    read_schema_columns,
)
from fide_crawler_spark.queries import QUERIES, load


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["q3_filter_predicates"](spark, sf_dir)
    assert has_pushed_filter(df, "o_orderstatus") or has_pushed_filter(df, "o_totalprice")


def test_column_pruning(spark, sf_dir):
    df = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .filter(F.col("l_quantity") > 10)
    )
    schemas = read_schema_columns(df)
    assert schemas and all(len(s) <= 2 for s in schemas), schemas


def test_dim_join_is_broadcast(spark, sf_dir):
    df = QUERIES["q5_broadcast_join_revenue"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_q1_is_single_shuffle(spark, sf_dir):
    # scan → partial agg → exchange → final agg (+ order-by exchange):
    # anything more means the plan regressed
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert count_exchanges(df) <= 2, count_exchanges(df)


def test_hot_path_is_codegen(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert codegen_stage_count(df) >= 1


def test_minhash_plan_has_no_python_udf(spark, sf_dir):
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q29_minhash_lsh_candidates"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "minhash must stay JVM-side"
    )


def test_no_unpartitioned_window_in_catalog_plans(spark, sf_dir):
    """No catalog query may plan a global (unpartitioned) WindowExec —
    the one-task collapse shape.  q13 (grand-total percentage) and q50
    (running sum) are the historical offenders; both now use
    cross-join-of-one-agg / two-pass layouts.  Keyed windows
    (partitionBy(...)) are fine and excluded by checking the window
    spec's partition clause."""
    from fide_crawler_spark.plans import formatted_plan

    # q13/q50 must have NO window at all (cross-join-of-one-agg /
    # two-pass layouts replace it); q9 (r6) replaced its keyed window
    # with a MIN(struct) aggregate — partial-combined, no window, and
    # still no single-partition collapse
    for name in (
        "q13_value_counts_normalized",
        "q50_shard_packing",
        "q9_window_dedup_keepfirst",
    ):
        plan = formatted_plan(QUERIES[name](spark, sf_dir))
        assert "Window" not in plan, (name, plan[:2000])
    # q9's aggregate must not collapse to one task (the global-agg
    # one-row SinglePartition in q13 is fine — it carries one row)
    plan9 = formatted_plan(QUERIES["q9_window_dedup_keepfirst"](spark, sf_dir))
    assert "SinglePartition" not in plan9, plan9[:2000]


def test_range_join_avoids_nested_loop(spark, sf_dir):
    """q49's binned range join must plan as a hash/merge equi-join on
    the bin key — never BroadcastNestedLoopJoin (the plan a raw
    inequality join degenerates to)."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q49_range_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_keyed_window(spark, sf_dir):
    """q48's as-of join is one window partitioned by the key — no join
    node at all, no Python, no unpartitioned window."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q48_asof_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Window") >= 1
    # the only join allowed is none: union + window implements the match
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bucketed_urlseen_join_has_no_shuffle(spark, tmp_path):
    """The 10^10-scale URL-seen path: frontier and seen-set bucketed by
    url_hash join with ZERO Exchange nodes (bucket i reads against
    bucket i).  Broadcast is disabled so the shuffle-free claim is
    about bucketing, not about the small side fitting in memory."""
    from fide_crawler_spark.plans import formatted_plan
    from fide_crawler_spark.sources.bucketed import (
        colocated_anti_join,
        write_bucketed,
    )

    # (spark.sql.warehouse.dir is a static conf — the managed tables
    # land in the session default and are dropped below)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        frontier = spark.range(20000).selectExpr(
            "id AS url_hash", "'pending' AS status"
        )
        seen = spark.range(10000).selectExpr("id * 2 AS url_hash")
        write_bucketed(frontier, "frontier_bkt", n_buckets=8)
        write_bucketed(seen, "seen_bkt", n_buckets=8)
        j = colocated_anti_join(spark, "frontier_bkt", "seen_bkt")
        plan = formatted_plan(j)
        assert "Exchange" not in plan, plan[:1500]
        assert "Bucketed: true" in plan
        assert j.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS frontier_bkt")
        spark.sql("DROP TABLE IF EXISTS seen_bkt")


def test_decontam_benchmark_is_broadcast(spark, sf_dir):
    """q52's semi-join must broadcast the (small) benchmark shingle
    set — the corpus side never shuffles its grams."""
    from fide_crawler_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["q52_decontamination"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:1500]


def test_bucketed_dedup_index_join_shuffles_batch_only(spark, tmp_path):
    """The incremental-dedup scale story made concrete: the corpus LSH
    index persisted bucketed by (band_id, band_hash) joins a freshly
    computed batch with NO Exchange on the corpus side — only the
    (small) batch shuffles to meet the bucketing.  End-to-end result is
    identical to the unbucketed path."""
    from fide_crawler_spark.operators.dedup import (
        banded_signatures,
        incremental_dedup,
    )
    from fide_crawler_spark.plans import formatted_plan
    from fide_crawler_spark.sources.bucketed import write_bucketed

    base = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1000 + i, base.replace("tok0", f"c{i}")) for i in range(40)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base), (2, "q " + " ".join(f"z{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            banded_signatures(corpus), "corpus_bands_bkt",
            key=["band_id", "band_hash"], n_buckets=8,
        )
        cb = spark.table("corpus_bands_bkt")
        nb = banded_signatures(new)
        j = nb.select(
            F.col("doc").alias("doc_new"), "band_id", "band_hash"
        ).join(
            cb.select(F.col("doc").alias("doc_old"), "band_id", "band_hash"),
            ["band_id", "band_hash"],
        )
        plan = formatted_plan(j)
        assert "Bucketed: true" in plan, plan[:1500]
        # every Exchange must sit in the SortMergeJoin's LEFT (batch)
        # subtree — tree lines there carry the ':' continuation marker.
        # The corpus side must read its bucket files straight into the
        # join: no Exchange on any unmarked (right-subtree) line.
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree, tree
        for line in tree.splitlines():
            if "Exchange" in line:
                assert ":" in line.split("Exchange")[0], tree

        got = sorted(
            r["doc_id"]
            for r in incremental_dedup(new, corpus, corpus_bands=cb).collect()
        )
        want = sorted(
            r["doc_id"] for r in incremental_dedup(new, corpus).collect()
        )
        assert got == want == [2]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS corpus_bands_bkt")


def test_partition_pruning_on_partitioned_write(spark, tmp_path, sf_dir):
    """Hive-style day-partitioned layout: a day-equality filter must
    appear as PartitionFilters on the scan (directory pruning — the
    scan never opens the other days' files), while a residual row
    filter stays a PushedFilter."""
    import os

    from fide_crawler_spark.plans import formatted_plan

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    d = str(tmp_path / "events_by_day")
    events.withColumn("day", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(d)

    one_day = spark.read.parquet(d).filter(
        (F.col("day") == "2024-01-03") & (F.col("value") > 10)
    )
    plan = formatted_plan(one_day)
    assert "PartitionFilters" in plan and "2024-01-03" in plan, plan[:1500]
    assert "PushedFilters" in plan and "GreaterThan(value,10" in plan, plan[:1500]
    # pruning is real: the pruned scan reads exactly the rows of that day
    assert (
        one_day.count()
        == events.filter(
            (F.to_date("ts") == "2024-01-03") & (F.col("value") > 10)
        ).count()
    )


def test_enrich_catalog_is_broadcast_and_jvm_only(spark, sf_dir):
    """q69: the candidate catalog must broadcast (never shuffle the
    fact keys against it) and the whole score/argmax path must stay
    JVM-side — levenshtein is a built-in, no Python-eval nodes."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q69_dgt_enrichment"](spark, sf_dir)
    plan = formatted_plan(df)
    # the catalog cross join builds on the broadcast (small) side, and
    # the per-key best table broadcasts back onto the facts
    assert "BroadcastNestedLoopJoin" in plan and "BuildRight" in plan
    assert has_broadcast_join(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_m4_chart_series_is_one_aggregate_shuffle(spark, sf_dir):
    """q73's physical contract: NULL filter pushed to the scan, one
    partial+final aggregate pair around a single hash exchange (plus
    the display order-by), zero Python eval nodes — a 10^10-point
    series reduces map-side before anything moves."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q73_chart_series_m4"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert has_pushed_filter(df, "value")
    # agg exchange + order-by range exchange; more means the partial
    # aggregation (map-side combine) regressed
    assert count_exchanges(df) <= 2, count_exchanges(df)
    # struct extrema aren't hash-aggregable, so Spark picks
    # SortAggregate — what matters for 10^10 points is that the
    # partial (map-side) mode is still there before the exchange
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    assert "partial_min" in plan  # map-side combine confirmed


def test_substring_dup_plan_is_jvm_semi_join_with_partials(spark, sf_dir):
    """q74's physical contract: zero Python eval nodes (the window
    logic is split/slice/xxhash64 higher-order expressions), window
    membership is a LEFT SEMI join on the 8-byte hash, and both
    groupBys (occurrence count, covered-position count) keep their
    partial (map-side) aggregation — the properties that keep a 100 TB
    corpus's W-fanout reduced before anything shuffles."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q74_substring_dup_stats"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftSemi" in plan
    assert "partial_count" in plan  # map-side combine on the groupBys


def test_weighted_sample_is_broadcast_filter_no_corpus_shuffle(spark, sf_dir):
    """q80's physical contract: the mean enters as a one-row
    IdentityBroadcast (single-partition aggregate), the membership
    test runs inside the join condition at scan speed, and the corpus
    side reaches the join straight from the FileScan — the only
    Exchanges are the mean's SinglePartition reduce and the display
    order-by."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q80_weighted_sample"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row build side
    assert count_exchanges(df) <= 2, count_exchanges(df)
    # schema pruned: only the key + weight columns are read
    assert all(
        set(cols) <= {"doc_id", "n_chars"} for cols in read_schema_columns(df)
    )


def test_retrieval_capstone_is_zero_shuffle_topk(spark, sf_dir):
    """q81's physical contract: chunk → embed → cosine top-k collapses
    into ONE codegen span ending in TakeOrderedAndProject — zero
    Exchanges, zero Python eval, no global sort; only the scan's
    (doc_id, text) columns are read."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q81_retrieval_capstone"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert count_exchanges(df) == 0, count_exchanges(df)
    assert all(
        set(cols) <= {"doc_id", "text"} for cols in read_schema_columns(df)
    )


def test_ccnet_bucket_sample_has_no_unpartitioned_window(spark, sf_dir):
    """q83's physical contract: the rank terciles come from the
    two-pass grouped_rank (Arrow mapInPandas over a range-partitioned
    sort) and the doc count rides a broadcast — the plan has NO Window
    node (a global row_number would serialize the corpus into one
    task) and no row-at-a-time Python eval."""
    from fide_crawler_spark.plans import formatted_plan

    df = QUERIES["q83_ccnet_bucket_sample"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan, "global window crept into q83"
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # one-row count build side
