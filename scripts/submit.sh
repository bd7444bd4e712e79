#!/usr/bin/env bash
# Package the engine and spark-submit the index-build job.
#
#   scripts/submit.sh [spark-submit options…] -- [build_job.py options…]
#
# Everything before `--` goes to spark-submit (master, deploy-mode,
# executor sizing, --packages for the Iceberg runtime); everything
# after goes to the job. The package ships as --py-files so executors
# import identical code — the north-rule run shape.
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
DIST="$ROOT/dist"
ZIP="$DIST/invertedindex_spark.zip"

mkdir -p "$DIST"
rm -f "$ZIP"
(cd "$ROOT" && zip -qr "$ZIP" invertedindex_spark \
    -x '*__pycache__*' -x '*.pyc')

SUBMIT_ARGS=()
while [[ $# -gt 0 && "$1" != "--" ]]; do
    SUBMIT_ARGS+=("$1"); shift
done
[[ $# -gt 0 ]] && shift   # drop the --

SPARK_SUBMIT="${SPARK_SUBMIT:-spark-submit}"
command -v "$SPARK_SUBMIT" >/dev/null 2>&1 || \
    SPARK_SUBMIT="$(python -c 'import os, pyspark; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

exec "$SPARK_SUBMIT" "${SUBMIT_ARGS[@]}" \
    --py-files "$ZIP" \
    "$ROOT/scripts/build_job.py" "$@"
