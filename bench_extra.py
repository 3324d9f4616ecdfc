"""Extra benchmarks / diagnostics (guide §1.4) — NOT the driver contract.

Per-entry wall time split into fn() vs count(), plus a StreamingQueryListener
that records every micro-batch's durationMs breakdown (addBatch, getBatch,
walCommit, queryPlanning, stateOperators counts) for every streaming query
the entries start.  Used to attribute the streaming entries' seconds to
phases before optimizing (OPTIMIZATION_r07.md cites these numbers).

Usage:
    python bench_extra.py [entry ...]        # default: all HEADLINE entries
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... as in bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from ksql_spark.session import get_spark
    from pyspark.sql.streaming import StreamingQueryListener

    names = sys.argv[1:] or HEADLINE

    extra_conf = json.loads(os.environ.get("BENCH_EXTRA_CONF", "{}"))
    spark = get_spark(
        app_name="ksql_spark_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf=extra_conf,
    )
    spark.sparkContext.setLogLevel("ERROR")

    progress_log: list[dict] = []

    class ProgressTap(StreamingQueryListener):
        def onQueryStarted(self, event):
            progress_log.append({"ev": "start", "name": event.name, "t": time.time()})

        def onQueryProgress(self, event):
            p = event.progress
            progress_log.append(
                {
                    "ev": "progress",
                    "name": p.name,
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                    "stateOperators": [
                        {
                            "operatorName": s.operatorName,
                            "numRowsTotal": s.numRowsTotal,
                            "numRowsUpdated": s.numRowsUpdated,
                            "commitTimeMs": s.commitTimeMs,
                            "numShufflePartitions": s.numShufflePartitions,
                            "customMetrics": dict(s.customMetrics),
                        }
                        for s in p.stateOperators
                    ],
                    "t": time.time(),
                }
            )

        def onQueryTerminated(self, event):
            progress_log.append({"ev": "end", "t": time.time()})

        def onQueryIdle(self, event):
            pass

    spark.streams.addListener(ProgressTap())

    qs = entry_mod.queries()
    spark.range(1000).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        mark = len(progress_log)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        n = df.count()
        t2 = time.time()
        time.sleep(0.2)  # let async listener events drain
        out[name] = {
            "total": round(t2 - t0, 3),
            "fn": round(t1 - t0, 3),
            "count": round(t2 - t1, 3),
            "rows": n,
            "progress": progress_log[mark:],
        }
        sys.stderr.write(
            f"{name}: total={out[name]['total']} fn={out[name]['fn']} "
            f"count={out[name]['count']}\n"
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
