#!/usr/bin/env bash
# Package the engine and launch the curation pipeline via spark-submit --py-files
# (north rule launch mode).  Usage:
#   scripts/submit_curate.sh [--master local[32]] [curate_job.py args...]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/fide_crawler_spark.zip
MASTER="local[${SPARK_GRAFT_CPUS:-32}]"

if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"; shift 2
fi

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" fide_crawler_spark -x '*__pycache__*')

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.parquet.columnarReaderBatchSize=1024 \
  --conf spark.ui.showConsoleProgress=false \
  --py-files "$ZIP" \
  "$REPO/jobs/curate_job.py" "$@"
