#!/usr/bin/env bash
# Package crawley_spark and run the crawl via spark-submit --py-files
# (north_rule deployment shape). Locally: local[N]; on a cluster swap
# --master and add executor confs.
#
#   tools/submit.sh [seed_url] [corpus.parquet]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/crawley_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" crawley_spark -x '*__pycache__*')
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-8}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/tools/submit_crawl.py" "$@"
