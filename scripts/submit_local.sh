#!/usr/bin/env bash
# spark-submit --py-files demonstration (north_rule run contract).
set -euo pipefail
cd "$(dirname "$0")/.."
PKG=/tmp/vlm_ocr_pipeline_spark.zip
rm -f "$PKG"
zip -qr "$PKG" vlm_ocr_pipeline_spark
WD=$(mktemp -d)
spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.ui.enabled=false \
  --py-files "$PKG" \
  jobs/run_extract.py \
  --input "$WD/pages" --workdir "$WD/wd" --mode staged \
  --synthesize "${1:-2000}"
rm -rf "$WD"
