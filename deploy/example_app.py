"""Example spark-submit driver: a persistent query over a transcripts table.

Submit with:  deploy/submit.sh deploy/example_app.py
(on a cluster, add --master / --num-executors etc.; the engine code arrives
via --py-files)
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from ksql_spark import (
    STREAM,
    TABLE,
    Catalog,
    Count,
    Create,
    F,
    LatestByOffset,
    Schema,
    Select,
    TimeUnit,
    TumblingWindow,
)
from ksql_spark.streaming.engine import PersistentQueryManager


def main() -> None:
    transcripts_path = sys.argv[1] if len(sys.argv) > 1 else "/data/transcripts"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/data/ksql_engine"

    spark = SparkSession.builder.appName("ksql_spark_app").getOrCreate()
    cat = Catalog(spark, root=f"{workdir}/catalog")
    cat.register_parquet(
        "transcripts",
        transcripts_path,
        ref=STREAM,
        event_time_col="ts",
        event_order_cols=["ts", "turn_idx"],
        partitions=spark.sparkContext.defaultParallelism,
        partition_key="conv_id",
    )
    mgr = PersistentQueryManager(spark, cat, workdir=f"{workdir}/engine")
    csas = Create(TABLE, "conv_minute_stats").AsSelect(
        Select(
            F("conv_id"),
            Count(F("turn_idx")).Alias("n_turns"),
            LatestByOffset(F("text")).Alias("last_text"),
        )
        .From(Schema("transcripts", STREAM))
        .WindowedBy(TumblingWindow(1, TimeUnit.MINUTES))
        .GroupBy(F("conv_id"))
        .EmitChanges()
    )
    # continuous deployment: processing-time trigger, runs until stopped
    pq = mgr.create_as_select(
        csas, available_now=False, processing_time="10 seconds", await_termination=False
    )
    pq.streaming_query.awaitTermination()


if __name__ == "__main__":
    main()
