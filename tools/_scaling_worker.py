"""One scaling-bench run: the flagship streaming pipeline at a given core count.

Usage: python tools/_scaling_worker.py <cores> <transcripts_dir> <out_json>

Pipeline (the north rule's flagship): transcripts stream -> watermark ->
tumbling(1m) windowed COUNT/SUM/LATEST_BY_OFFSET per conv_id -> EMIT CHANGES
changelog -> exactly-once sink.  availableNow drains the whole input; wall
time covers the full streaming lifecycle (planning + all micro-batches +
sink commits), measured after a JVM/codegen warm-up job.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, data, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]

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
        Sum,
        TimeUnit,
        TumblingWindow,
    )
    from ksql_spark.session import get_spark
    from ksql_spark.streaming.engine import PersistentQueryManager

    spark = get_spark(
        app_name=f"scaling_{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet reader paths (excluded from timing)
    spark.read.parquet(data).limit(10000).groupBy("conv_id").count().count()
    rows = spark.read.parquet(data).count()

    work = tempfile.mkdtemp(prefix=f"ksql_scaling_{cores}_")
    cat = Catalog(spark, root=os.path.join(work, "cat"))
    cat.register_parquet(
        "transcripts",
        data,
        ref=STREAM,
        event_time_col="ts",
        event_order_cols=["ts", "turn_idx"],
        metadata={"max_files_per_trigger": 100000},
    )
    mgr = PersistentQueryManager(
        spark,
        cat,
        workdir=os.path.join(work, "eng"),
        grace="10 minutes",
        enable_metrics=False,
        lineage=False,
    )
    csas = Create(TABLE, "conv_window_stats").AsSelect(
        Select(
            F("conv_id"),
            Count(F("turn_idx")).Alias("n_turns"),
            Sum(F("turn_idx")).Alias("sum_idx"),
            LatestByOffset(F("text")).Alias("last_text"),
        )
        .From(Schema("transcripts", STREAM))
        .WindowedBy(TumblingWindow(1, TimeUnit.MINUTES))
        .GroupBy(F("conv_id"))
        .EmitChanges()
    )
    t0 = time.time()
    mgr.create_as_select(csas, available_now=True, await_termination=True)
    dt = time.time() - t0
    state_rows = cat.read("QUERYABLE_conv_window_stats").count()

    with open(out, "w") as fh:
        json.dump(
            {
                "cores": cores,
                "input_rows": rows,
                "seconds": round(dt, 3),
                "turns_per_sec": round(rows / dt, 1),
                "state_rows": state_rows,
            },
            fh,
        )
    spark.stop()


if __name__ == "__main__":
    main()
