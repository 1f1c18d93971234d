#!/usr/bin/env bash
# Ship the pipeline via spark-submit --py-files (the cluster deployment
# path; works identically against local[*] in the sandbox).
#
# usage: scripts/submit.sh <transcripts.parquet> <warehouse-dir> [extra spark-submit args...]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
TRANSCRIPTS="${1:?transcripts parquet path}"
WAREHOUSE="${2:?warehouse dir}"
shift 2 || true

BUILD_DIR="$(mktemp -d)"
trap 'rm -rf "$BUILD_DIR"' EXIT
ZIP="$BUILD_DIR/name_matching_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" name_matching_spark -x '*__pycache__*')

# Model artifacts ride as --files and are resolved next to the job.
ARTIFACTS="$REPO/models/match_gbm.json,$REPO/models/tfidf.json,$REPO/models/train_corpus.json"

exec spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-64}" \
  --py-files "$ZIP" \
  --files "$ARTIFACTS" \
  "$@" \
  "$REPO/name_matching_spark/pipeline.py" \
  "$TRANSCRIPTS" "$WAREHOUSE"
