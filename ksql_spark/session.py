"""Tuned SparkSession factory.

Encodes the engine's scale-oriented defaults: AQE on (runtime re-plan +
skew-join splitting), RocksDB state store for streaming aggregates (bounded
executor memory at 10^12-turn state), Arrow for every pandas-UDF boundary,
UTC session time so event-time semantics are deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ksql_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("KSQL_SPARK_MASTER", "local[*]")
    cores = _core_count(master)
    shuffle = shuffle_partitions or cores

    # Scratch placement (guide §9: point spark.local.dir at the fastest
    # local storage): cluster deployments set KSQL_SPARK_LOCAL_DIR (or
    # spark.local.dir via extra_conf) to their NVMe scratch volumes.  A
    # tmpfs default was measured here (interleaved A/B, r7) at parity with
    # the ext4 tempdir, so no default override is applied.
    local_dir = os.environ.get("KSQL_SPARK_LOCAL_DIR")

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # RocksDB sizing (round-5 tuning sweep, BENCH/BASELINE.md): larger
        # write buffers + block cache cut per-batch store open/flush/commit
        # overhead, lifting the flagship ~10% at 16 cores (and the 4->16
        # scaling pair from 0.72 to 0.84); memory is native/off-heap,
        # per-store, lazily allocated — executors with many store
        # partitions can lower these per deployment
        .config("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "64")
        .config("spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber", "3")
        .config("spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB", "256")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("KSQL_SPARK_DRIVER_MEM", "8g"))
    )
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def _core_count(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    return int(os.environ.get("KSQL_SPARK_CLUSTER_CORES", "256"))
