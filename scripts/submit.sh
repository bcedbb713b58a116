#!/usr/bin/env bash
# Cluster deployment (north_rule: "run via spark-submit --py-files on a
# multi-executor cluster"). Packages the engine as a zip and submits the
# stream driver. Iceberg runtime + catalog conf are cluster-side; the
# sink auto-selects IcebergMergeSink when the catalog is present
# (streaming/sink_iceberg.py:is_available), ParquetMergeSink otherwise.
#
# Usage:
#   SPARK_MASTER=yarn ./scripts/submit.sh --feed-dir ... --table ...
#   SPARK_SUBMIT_EXTRA="--num-executors 256 --executor-cores 4" \
#     SPARK_MASTER=k8s://https://... ./scripts/submit.sh ...
#
# Env knobs: SPARK_MASTER (required for a real cluster), DEPLOY_MODE
# (default client — 'cluster' deploy of Python apps is not supported on
# standalone masters), SHUFFLE_PARTITIONS, SPARK_SUBMIT_EXTRA (extra
# spark-submit args, word-split). Everything on the command line goes
# to the `stream` subcommand.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/marc_data_migration_spark.zip"
(cd "$REPO" && python -m zipfile -c "$ZIP" marc_data_migration_spark/)

MASTER_ARGS=()
[ -n "${SPARK_MASTER:-}" ] && MASTER_ARGS=(--master "$SPARK_MASTER")

# shellcheck disable=SC2086  # SPARK_SUBMIT_EXTRA is intentionally word-split
exec spark-submit \
  "${MASTER_ARGS[@]}" \
  --deploy-mode "${DEPLOY_MODE:-client}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-2048}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  ${SPARK_SUBMIT_EXTRA:-} \
  "$REPO/marc_data_migration_spark/__main__.py" \
  stream "$@"
