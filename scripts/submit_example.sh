#!/usr/bin/env bash
# Cluster deployment (north rule: spark-submit --py-files on multi-executor).
# Package the engine and run the full validation job at two cluster sizes to
# evidence scaling efficiency (sandbox analogue: scripts/scaling_bench.py).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f okay_spark.zip
zip -qr okay_spark.zip okay_spark
spark-submit \
  --py-files okay_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-2000}" \
  submit_job.py \
  --input "${INPUT_TABLE:?set INPUT_TABLE}" \
  --catalog "${MEDIA_CATALOG:?set MEDIA_CATALOG}" \
  --output "${OUTPUT:?set OUTPUT}" \
  --run-id "${RUN_ID:-run-$(date +%Y%m%d)}"
