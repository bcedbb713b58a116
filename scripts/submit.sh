#!/usr/bin/env bash
# Cluster deployment (north_rule: "run via spark-submit --py-files on a
# multi-executor cluster"). Packages the engine as a zip and submits the
# stream driver. Iceberg runtime + catalog conf are cluster-side; the
# sink auto-selects IcebergMergeSink when the catalog is present
# (streaming/sink_iceberg.py:is_available), ParquetMergeSink otherwise.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/marc_data_migration_spark.zip"
(cd "$REPO" && python -m zipfile -c "$ZIP" marc_data_migration_spark/)

exec spark-submit \
  --deploy-mode cluster \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-2048}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
  --conf spark.sql.catalog.lake.type=hive \
  "$REPO/marc_data_migration_spark/__main__.py" \
  stream "$@"
