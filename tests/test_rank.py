"""grouped_rank must equal the window row_number form exactly."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from fide_crawler_spark.operators.rank import grouped_rank, grouped_topk


def _df(spark, n=5000, hosts=3, seed=1):
    rng = random.Random(seed)
    rows = [
        (f"h{rng.randrange(hosts)}", rng.randrange(100), f"u{i:06d}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "host string, pri int, url string")


def test_global_rank_equals_window(spark):
    df = _df(spark)
    order = [F.col("pri").asc(), F.col("url").asc()]
    got = {
        r["url"]: r["rank"]
        for r in grouped_rank(df, [], order, "rank").collect()
    }
    w = Window.orderBy("pri", "url")
    expect = {
        r["url"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == expect


def test_grouped_rank_equals_window(spark):
    df = _df(spark)
    order = [F.col("pri").desc(), F.col("url").asc()]
    got = {
        r["url"]: r["rank"]
        for r in grouped_rank(df, ["host"], order, "rank").collect()
    }
    w = Window.partitionBy("host").orderBy(F.desc("pri"), F.asc("url"))
    expect = {
        r["url"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == expect


def test_grouped_topk_equals_window(spark):
    df = _df(spark, n=2000)
    order = [F.col("pri").asc(), F.col("url").asc()]
    got = {r["url"] for r in grouped_topk(df, ["host"], order, k=7).collect()}
    w = Window.partitionBy("host").orderBy("pri", "url")
    expect = {
        r["url"]
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .collect()
    }
    assert got == expect


def test_rank_stable_across_partitionings(spark):
    df = _df(spark, n=3000)
    order = [F.col("pri").asc(), F.col("url").asc()]
    a = grouped_rank(df, ["host"], order, "rank", num_partitions=2).collect()
    b = grouped_rank(df, ["host"], order, "rank", num_partitions=17).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dequeue_rank_equals_two_pass(spark):
    from fide_crawler_spark.operators.rank import dequeue_rank

    df = _df(spark, n=4000, hosts=4, seed=2)
    order = [F.col("pri").asc(), F.col("url").asc()]
    fused = {
        r["url"]: r["rank"]
        for r in dequeue_rank(df, "host", order, budget_per_host=300).collect()
    }
    w_host = Window.partitionBy("host").orderBy("pri", "url")
    capped = (
        df.withColumn("hr", F.row_number().over(w_host))
        .filter(F.col("hr") <= 300)
        .drop("hr")
    )
    w_all = Window.orderBy("pri", "url")
    expect = {
        r["url"]: r["rank"]
        for r in capped.withColumn("rank", F.row_number().over(w_all)).collect()
    }
    assert fused == expect


def test_dequeue_rank_many_hosts_mixed_budgets(spark):
    """Bounded-broadcast edges: many hosts where (a) most never exceed
    the budget (no offset entry, pos<budget alone must be exact),
    (b) some are over budget (dead_from cutoff), (c) hosts absent from
    middle partitions — all must still equal the window form."""
    from fide_crawler_spark.operators.rank import dequeue_rank

    rows = []
    # 60 light hosts (3 rows each, under budget=5), 6 heavy (40 rows)
    for h in range(60):
        for i in range(3):
            rows.append((f"light{h}", (h * 7 + i * 13) % 50, f"l{h}-{i}"))
    for h in range(6):
        for i in range(40):
            rows.append((f"heavy{h}", (h + i * 11) % 50, f"h{h}-{i}"))
    df = spark.createDataFrame(rows, "host string, pri int, url string")
    order = [F.col("pri").asc(), F.col("url").asc()]
    fused = {
        r["url"]: r["rank"]
        for r in dequeue_rank(
            df, "host", order, budget_per_host=5, num_partitions=13
        ).collect()
    }
    w_host = Window.partitionBy("host").orderBy("pri", "url")
    capped = (
        df.withColumn("hr", F.row_number().over(w_host))
        .filter(F.col("hr") <= 5).drop("hr")
    )
    w_all = Window.orderBy("pri", "url")
    expect = {
        r["url"]: r["rank"]
        for r in capped.withColumn("rank", F.row_number().over(w_all)).collect()
    }
    assert fused == expect
