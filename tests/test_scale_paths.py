"""Scale-path evidence: the driver never materializes the frontier, and
the dequeue operators stay parallel on inputs far beyond test size."""

from __future__ import annotations

from pyspark.sql import functions as F

from fide_crawler_spark.operators.frontier import generate_frontier, priority_order
from fide_crawler_spark.operators.rank import dequeue_rank


def test_multimillion_frontier_generated_executor_side(spark):
    """5.04M-URL frontier from a 5k-row seed table via sequence+explode:
    the driver holds only the seed rows; count + a pushed-down filter
    run fine.  (10^10 = the same plan with a bigger seed table.)"""
    seeds = spark.range(5000).select(
        F.concat(F.lit("9"), F.col("id").cast("string")).alias("fide_id"),
        F.col("id").cast("int").alias("seed_pos"),
    )
    frontier = generate_frontier(seeds, "1941-01-01", "2024-12-01")  # 1008 months
    assert frontier.count() == 5000 * 1008
    # partition-prunable month predicate
    n_2024 = frontier.filter(
        (F.col("period") >= "2024-01-01") & (F.col("period") <= "2024-12-31")
    ).count()
    assert n_2024 == 5000 * 12


def test_dequeue_rank_on_large_input_stays_parallel(spark):
    """dequeue_rank over 1M rows with a small budget: the result is the
    exact top-k and no stage ran as a single task over the full input
    (the window-function formulation would)."""
    seeds = spark.range(2000).select(
        F.col("id").cast("string").alias("fide_id"),
        F.col("id").cast("int").alias("seed_pos"),
    )
    frontier = generate_frontier(seeds, "1983-04-01", "2024-12-01")  # 500 months
    stats: dict = {}
    caches: list = []
    batch = dequeue_rank(
        frontier, "host", priority_order(), budget_per_host=1000,
        stats_out=stats, caches=caches,
    )
    try:
        rows = batch.select("seed_pos", "period", "rank").orderBy("rank").collect()
    finally:
        for c in caches:
            c.unpersist()
    assert stats["n_survivors"] == 1000 == len(rows)
    # exact semantics: the top 1000 by (seed_pos, period) = seeds 0..1,
    # then seed 2's first 498 months... i.e. ranks follow seed_pos asc
    assert [r["rank"] for r in rows] == list(range(1, 1001))
    assert rows[0]["seed_pos"] == 0 and rows[-1]["seed_pos"] == 1000 // 501


def test_pack_shards_equals_window_form_any_parallelism(spark):
    """Shard boundaries are a data property: the two-pass scalable form
    equals the single-window reference at different partition counts."""
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.shards import (
        pack_shards,
        pack_shards_window,
    )

    docs = spark.createDataFrame(
        [(i, 50 + (i * 37) % 300) for i in range(5000)],
        "doc_id long, n_tokens long",
    )
    order = [F.col("doc_id").asc()]
    expect = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards_window(docs, "n_tokens", 4096, order).collect()
    }
    for p in (3, 17):
        got = {
            r["doc_id"]: r["shard_id"]
            for r in pack_shards(
                docs, "n_tokens", 4096, order, num_partitions=p
            ).collect()
        }
        assert got == expect
    # packing invariant: shard token sums ≈ budget (except the last)
    import collections

    sums = collections.defaultdict(int)
    toks = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    for d, s in expect.items():
        sums[s] += toks[d]
    max_doc = max(toks.values())
    last = max(sums)
    assert all(4096 - max_doc <= v for s, v in sums.items() if s != last)


def test_pack_shards_null_tokens_count_as_zero(spark):
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.shards import (
        pack_shards,
        pack_shards_window,
    )

    docs = spark.createDataFrame(
        [(0, 100), (1, None), (2, 100)], "doc_id long, n_tokens long"
    )
    order = [F.col("doc_id").asc()]
    got = {r["doc_id"]: r["shard_id"]
           for r in pack_shards(docs, "n_tokens", 150, order).collect()}
    exp = {r["doc_id"]: r["shard_id"]
           for r in pack_shards_window(docs, "n_tokens", 150, order).collect()}
    assert got == exp == {0: 0, 1: 0, 2: 0}


def test_pack_shards_rejects_fractional_token_type(spark):
    """Both passes accumulate int64; a DOUBLE token column would be
    silently truncated (diverging from the window form) — must raise."""
    import pytest
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.shards import pack_shards

    docs = spark.createDataFrame(
        [(0, 10.5), (1, 20.25)], "doc_id long, n_tokens double"
    )
    with pytest.raises(TypeError, match="integral"):
        pack_shards(docs, "n_tokens", 100, [F.col("doc_id").asc()])


def test_best_match_enrich_scales_with_distinct_keys(spark):
    """500k fact rows but only 200 distinct keys: the scoring cross
    join is |distinct keys| x |catalog| (not |facts| x |catalog| — the
    reference loops per fact row), the catalog side broadcasts, and
    every fact row still comes back enriched."""
    from fide_crawler_spark.operators.enrich import best_match_enrich
    from fide_crawler_spark.plans import formatted_plan

    facts = spark.range(500_000).select(
        F.concat(F.lit("event "), (F.col("id") % 200).cast("string")).alias(
            "tournament_name"
        )
    )
    catalog = spark.range(100).select(
        F.concat(
            F.lit("https://lichess.org/broadcast/event-"),
            (F.col("id") * 2).cast("string"),
        ).alias("link"),
        F.concat(F.lit("Event "), F.col("id").cast("string")).alias("title"),
        F.col("id").alias("pos"),
    )
    out = best_match_enrich(facts, catalog)
    assert "BroadcastExchange" in formatted_plan(out)
    assert out.count() == 500_000
    # every even key matches its slug exactly (accuracy 1.0)
    exact = out.filter(
        (F.col("tournament_name") == "event 42") & (F.col("dgt") == 1)
    ).limit(1).collect()
    assert exact and abs(exact[0]["dgt_accuracy"] - 1.0) < 1e-9


def test_pack_sequences_python_replay_any_parallelism(spark):
    """Concat-and-chop: replay the full piece layout in pure Python
    (cumulative offsets, boundary splits) and require byte-identity at
    two partition counts."""
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.shards import pack_sequences

    L = 64
    toks = [(i, 1 + (i * 37) % 150) for i in range(500)]
    docs = spark.createDataFrame(toks, "doc_id long, n_tokens long")
    off, want = 0, set()
    for d, n in toks:  # doc_id order
        for s in range(off // L, (off + max(n - 1, 0)) // L + 1):
            ps = max(s * L - off, 0)
            pe = min((s + 1) * L - off, n)
            want.add((d, s, max(off - s * L, 0), ps, pe - ps))
        off += n
    for p in (3, 17):
        got = {
            (r["doc_id"], r["seq_id"], r["seq_pos"], r["piece_start"],
             r["piece_len"])
            for r in pack_sequences(
                docs, "n_tokens", L, [F.col("doc_id").asc()],
                num_partitions=p,
            ).collect()
        }
        assert got == want


def test_pack_sequences_invariants(spark):
    """Every sequence except the last is exactly seq_len tokens and its
    pieces tile [0, L) contiguously; per-doc pieces reassemble the doc."""
    import collections

    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.shards import pack_sequences

    L = 100
    toks = [(i, 30 + (i * 61) % 250) for i in range(300)]
    docs = spark.createDataFrame(toks, "doc_id long, n_tokens long")
    rows = pack_sequences(
        docs, "n_tokens", L, [F.col("doc_id").asc()]
    ).collect()
    by_seq = collections.defaultdict(list)
    by_doc = collections.defaultdict(list)
    for r in rows:
        by_seq[r["seq_id"]].append(r)
        by_doc[r["doc_id"]].append(r)
    last = max(by_seq)
    for s, ps in by_seq.items():
        ps.sort(key=lambda r: r["seq_pos"])
        assert ps[0]["seq_pos"] == 0
        for a, b in zip(ps, ps[1:]):
            assert a["seq_pos"] + a["piece_len"] == b["seq_pos"]
        total = sum(r["piece_len"] for r in ps)
        assert total == L or (s == last and total <= L)
    n_by_doc = dict(toks)
    for d, ps in by_doc.items():
        ps.sort(key=lambda r: r["piece_start"])
        assert ps[0]["piece_start"] == 0
        for a, b in zip(ps, ps[1:]):
            assert a["piece_start"] + a["piece_len"] == b["piece_start"]
        assert sum(r["piece_len"] for r in ps) == n_by_doc[d]


def test_pack_sequences_zero_token_doc_single_empty_piece(spark):
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.shards import pack_sequences

    docs = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 10)], "doc_id long, n_tokens long"
    )
    rows = {
        r["doc_id"]: (r["seq_id"], r["seq_pos"], r["piece_len"])
        for r in pack_sequences(
            docs, "n_tokens", 8, [F.col("doc_id").asc()]
        ).collect()
        if r["doc_id"] == 1
    }
    assert rows == {1: (1, 2, 0)}  # off=10 -> seq 1, pos 2, empty


def test_pack_sequences_token_offset_continuation(spark):
    """The streaming hook: packing two halves with token_offset =
    committed total equals packing the whole corpus at once — the same
    associativity contract pack_shards carries."""
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.shards import pack_sequences

    L = 64
    toks = [(i, 1 + (i * 53) % 120) for i in range(400)]
    docs = spark.createDataFrame(toks, "doc_id long, n_tokens long")
    whole = {
        tuple(r) for r in pack_sequences(
            docs, "n_tokens", L, [F.col("doc_id").asc()]
        ).collect()
    }
    first = docs.filter("doc_id < 200")
    rest = docs.filter("doc_id >= 200")
    committed = sum(n for d, n in toks if d < 200)
    split = {
        tuple(r) for r in pack_sequences(
            first, "n_tokens", L, [F.col("doc_id").asc()]
        ).collect()
    } | {
        tuple(r) for r in pack_sequences(
            rest, "n_tokens", L, [F.col("doc_id").asc()],
            token_offset=committed,
        ).collect()
    }
    assert split == whole


def test_connected_components_hub_star_graph(spark):
    """Skew witness: a 200k-edge star (one hub) is the worst case for
    neighbourhood materialization — the distributed rounds must finish
    with groupBy-min + joins only (no collect_list, asserted in
    test_cluster) and label every spoke with the component min even
    when the min IS the hub's neighbour set's smallest member."""
    from pyspark.sql import functions as F

    from fide_crawler_spark.operators.cluster import connected_components

    hub = 100_000
    edges = spark.range(200_000).select(
        F.lit(hub).alias("doc_a"), F.col("id").alias("doc_b")
    ).filter(F.col("doc_b") != hub)
    out = connected_components(edges, driver_cap=0)
    assert out.count() == 200_000
    # min node of the component is id 0
    assert out.filter(F.col("component") != 0).count() == 0
