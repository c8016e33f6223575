#!/usr/bin/env bash
# Cluster submission (north rule: "run via spark-submit --py-files on a
# multi-executor cluster at two cluster sizes").
#
# Packages the library as a zip shipped to every executor and submits
# the given driver script (default: bench.py). The same entry points
# run unchanged on local[N] and on a real cluster — only --master and
# executor sizing differ.
#
# Usage:
#   tools/submit.sh [driver_script] [spark-submit args...]
#   MASTER=spark://host:7077 EXECUTORS=32 tools/submit.sh bench.py
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
DRIVER="${1:-$REPO/bench.py}"
shift || true

PYZIP="$(mktemp -d)/webscrape_neko_jirushi_spark.zip"
(cd "$REPO" && zip -qr "$PYZIP" webscrape_neko_jirushi_spark __spark_entry__.py)

exec spark-submit \
  --master "${MASTER:-local[${SPARK_GRAFT_CPUS:-8}]}" \
  ${EXECUTORS:+--num-executors "$EXECUTORS"} \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$PYZIP" \
  "$DRIVER" "$@"
