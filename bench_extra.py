#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the graded bench — bench.py is frozen for measurement.  This tool
exists to (a) time individual queries with the noop sink, best-of-N,
with job descriptions so the timeline is attributable, and (b) dump
``explain("formatted")`` for each query to plans/<tag>/<name>_<suffix>.txt
so plan-shape claims in OPTIMIZATION_r*.md are checkable.

Usage:
  python bench_extra.py [--queries q5_broadcast_join_revenue,...]
                        [--repeats 3] [--plans-dir plans/r06]
                        [--suffix before|after] [--no-time]

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from fide_crawler_spark.session import get_spark, stop_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    from fide_crawler_spark.queries import QUERIES, TABLES

    names = (
        [n for n in args.queries.split(",") if n]
        if args.queries
        else list(QUERIES)
    )

    spark = get_spark("bench_extra", cores=CPUS)
    # same warmup as bench.py so numbers are comparable
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").schema
    import pandas as pd  # noqa: F401

    spark.range(32).repartition(CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        if args.plans_dir:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
        if args.no_time:
            continue
        best = float("inf")
        times = []
        for _ in range(max(1, args.repeats)):
            spark.sparkContext.setJobDescription(f"{name} [{args.suffix}]")
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"  {name}: best={best:.3f} all={times}", file=sys.stderr)
    stop_spark()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
