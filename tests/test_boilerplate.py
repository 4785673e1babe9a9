"""Boilerplate stripping on planted templates + deterministic shuffle
stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from fide_crawler_spark.operators.boilerplate import (
    line_doc_freq,
    strip_boilerplate,
)
from fide_crawler_spark.operators.sampling import deterministic_shuffle

BANNER = "ACCEPT COOKIES TO CONTINUE"
FOOTER = "copyright example corp"


def _docs(spark):
    rows = [
        (0, f"{BANNER}\nunique zero line\n{FOOTER}"),
        (1, f"{BANNER}\nunique one line\nanother one\n{FOOTER}"),
        (2, f"{BANNER}\n{FOOTER}"),                       # pure boilerplate
        (3, "totally unique doc\nwith two lines"),
        (4, f"repeated inside\nrepeated inside\n{FOOTER}"),  # within-doc dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_line_doc_freq_counts_documents_not_occurrences(spark):
    docs, _ = _docs(spark)
    freq = {
        r["line"]: r["doc_freq"] for r in line_doc_freq(docs).collect()
    }
    assert freq[BANNER] == 3 and freq[FOOTER] == 4
    # within-doc repetition counts once
    assert freq["repeated inside"] == 1


def test_strip_boilerplate_planted(spark):
    docs, _ = _docs(spark)
    out = {
        r["doc_id"]: (r["n_lines_before"], r["n_lines_after"], r["cleaned_text"])
        for r in strip_boilerplate(docs, min_doc_freq=2).collect()
    }
    assert out[0] == (3, 1, "unique zero line")
    assert out[1] == (4, 2, "unique one line\nanother one")
    assert out[2] == (2, 0, "")              # row survives, lines don't
    assert out[3] == (2, 2, "totally unique doc\nwith two lines")
    # a line repeated only WITHIN one doc is not boilerplate — both
    # copies survive, order preserved
    assert out[4] == (3, 2, "repeated inside\nrepeated inside")


def test_strip_boilerplate_portable_equals_hashed(spark):
    docs, _ = _docs(spark)
    a = strip_boilerplate(docs, min_doc_freq=2, portable=False).collect()
    b = strip_boilerplate(docs, min_doc_freq=2, portable=True).collect()
    key = lambda rows: sorted((r["doc_id"], r["cleaned_text"]) for r in rows)  # noqa: E731
    assert key(a) == key(b)


def test_deterministic_shuffle_is_total_and_stable(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = deterministic_shuffle(docs, salt="s1")
    pos = {r["doc_id"]: r["shuffle_pos"] for r in a.collect()}
    assert sorted(pos.values()) == list(range(1, 1001))  # a true permutation
    # stable across partitioning
    b = deterministic_shuffle(docs.repartition(17), salt="s1")
    assert pos == {r["doc_id"]: r["shuffle_pos"] for r in b.collect()}
    # a different salt draws a different permutation
    c = deterministic_shuffle(docs, salt="s2")
    assert pos != {r["doc_id"]: r["shuffle_pos"] for r in c.collect()}


def test_frame_sample_matches_python_slices(spark):
    from fide_crawler_spark.operators.multimodal import frame_sample

    payloads = {
        0: bytes(range(256)),          # 4 full 64-byte frames
        1: b"x" * 100,                 # 1 full frame + dropped partial tail
        2: b"s",                       # shorter than one frame -> no rows
    }
    media = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    got = {
        (r["doc_id"], r["frame_idx"]): (r["n_frames"], bytes(r["frame"]))
        for r in frame_sample(media, frame_bytes=64, every_k=2).collect()
    }
    want = {}
    for d, p in payloads.items():
        n = len(p) // 64
        for i in range(0, n, 2):
            want[(d, i)] = (n, p[i * 64 : (i + 1) * 64])
    assert got == want
    assert (2, 0) not in got  # sub-frame payload emits nothing


def test_frame_sample_is_jvm_only(spark):
    from fide_crawler_spark.operators.multimodal import frame_sample
    from fide_crawler_spark.plans import formatted_plan

    media = spark.createDataFrame(
        [(0, b"y" * 256)], "doc_id long, payload binary"
    )
    plan = formatted_plan(frame_sample(media))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # zero shuffle, stays co-partitioned


# ----------------------------------------------- heavy-template skew


def _skewed_docs(spark, n=20000):
    """The real web case: one banner line in ~every doc.  In a plain
    shuffled LEFT ANTI join all n copies of the banner's line_key land
    in one task — an O(corpus) straggler."""
    banner = "THE COOKIE BANNER " * 20
    return banner, spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(banner + "\n"),
            F.format_string("unique line %d", F.col("id")),
        ).alias("text"),
    )


def test_heavy_template_broadcast_anti_join(spark):
    """broadcast_boiler=True: the boilerplate key set broadcasts, so
    exploded lines are never shuffled by line_key at all — each scan
    task marks its own rows (balanced by construction, no task sees
    more than its input split).  r6: membership is a broadcast LEFT
    OUTER mark (one groupBy computes before/after counts and the
    reassembly together) instead of the r5 LEFT ANTI + separate count
    branch — the lines-never-shuffled-by-key property is unchanged."""
    from fide_crawler_spark.plans import formatted_plan

    banner, docs = _skewed_docs(spark, n=2000)
    out = strip_boilerplate(docs, broadcast_boiler=True)
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "SortMergeJoin" not in plan
    rows = out.collect()
    assert all(r["n_lines_after"] == 1 for r in rows)
    assert all(banner.strip() not in r["cleaned_text"] for r in rows)


def test_heavy_template_aqe_skew_split(spark, tmp_path):
    """The giant-template-set case where the key set is too big to
    broadcast: with the boiler keys materialized (the persisted-index
    shape streaming/curation.py uses), the anti join's probe side is a
    plain shuffle stage and AQE's skew-join splits the hot banner
    partition across tasks — pinned via the final adaptive plan's
    SortMergeJoin(skew=true) + 'AQEShuffleRead skewed' markers.
    Thresholds are forced low so the 20k-copy banner counts as skewed
    at test scale."""
    banner, docs = _skewed_docs(spark)
    keys_path = str(tmp_path / "boiler_keys")
    line_doc_freq(docs).filter(F.col("doc_freq") >= 2).select(
        "line_key"
    ).write.parquet(keys_path)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1024",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        out = strip_boilerplate(
            docs, boiler_keys=spark.read.parquet(keys_path)
        )
        rows = out.collect()
        final = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    assert "SortMergeJoin(skew=true)" in final, final[:2000]
    assert "AQEShuffleRead skewed" in final
    assert all(r["n_lines_after"] == 1 for r in rows)
    assert sum(r["n_lines_before"] for r in rows) == 2 * len(rows)
