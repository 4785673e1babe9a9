"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads); the same configs are what we would ship to a real cluster via
``spark-submit --py-files`` (see bench.py) — AQE on, Arrow on, shuffle
partitions sized to cores instead of the 200 default, UTC session TZ so
results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Python workers resolve cloudpickled module-level functions by
# importing their module, so the package root must be on the workers'
# PYTHONPATH regardless of the driver's cwd (e.g. a driver harness
# launched from another directory).  The env var must be set before the
# JVM starts — workers inherit the JVM's environment.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _PKG_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _PKG_ROOT + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _PKG_ROOT
    )


def get_spark(
    app_name: str = "fide_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` controls local parallelism (the N vs 4N scaling evidence in
    bench.py passes 8 and 32).  ``shuffle_partitions`` defaults to
    ``cores`` — on a real cluster you would size this to total executor
    cores; the point is the same: no 200-partition default.
    """
    cores = cores or DEFAULT_CPUS
    shuffle = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # zstd: measured on the 20k-url span batch — write 6.6 s vs
        # snappy's 7.6 s AND 95 MB vs 174 MB on disk (guide §6); every
        # downstream snapshot read scans ~45% fewer bytes
        .config("spark.sql.parquet.compression.codec", "zstd")
        # InferFiltersFromGenerate synthesizes size(e)>0 / isnotnull(e)
        # from every explode(e) and predicate pushdown then substitutes
        # the FULL generator-input expression into a scan-level filter —
        # for our higher-order-function shingle/window arrays (lambdas
        # are CodegenFallback: interpreted, no subexpression
        # elimination) that evaluates the whole array expression twice
        # per row, the same duplication class as a filter on a UDF
        # column.  The filter it adds buys nothing here: explode of an
        # empty array already emits no rows.  Measured at sf0.1: the
        # hoisted shingle kernel drops 2.1 → 0.4 s with the rule
        # excluded; scale-independent (the duplicated work is per input
        # row everywhere).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # span documents are wide nested rows (~1k structs at realistic
        # page weight); the default 4096-row reader batch OOMs on them
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
