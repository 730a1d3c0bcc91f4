#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north-rule launch shape):
#   tools/make_pyfiles.sh
#   spark-submit --py-files dist/kmtricks_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       run_pipeline.py ...   # or: python -m kmtricks_spark.cli ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kmtricks_spark.zip
zip -qr dist/kmtricks_spark.zip kmtricks_spark -x '*__pycache__*'
echo "dist/kmtricks_spark.zip"
unzip -l dist/kmtricks_spark.zip | tail -2
