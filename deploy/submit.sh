#!/usr/bin/env bash
# spark-submit deployment for multi-executor clusters (north rule).
#
# Packages the engine as a zip for --py-files and submits the given driver
# script with the engine's production configuration: RocksDB state store,
# AQE, Arrow, UTC session time.  Cluster size is whatever the cluster
# manager provides (the engine is size-agnostic; scaling evidence at two
# sizes is in BENCH/BASELINE.md).
#
# Usage: deploy/submit.sh <driver.py> [app args...]
#   extra spark-submit flags (--master, --num-executors, ...) go in
#   $SPARK_SUBMIT_ARGS; positional args after the driver are app args
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
APP="${1:?usage: deploy/submit.sh <driver.py> [app args...]}"
shift || true

ZIP="$(mktemp -d)/ksql_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" ksql_spark -x '*__pycache__*')

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \
  --conf spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true \
  ${SPARK_SUBMIT_ARGS:-} \
  "$APP" \
  "$@"
