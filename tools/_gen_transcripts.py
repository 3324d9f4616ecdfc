"""Subprocess transcript generation for the scaling bench.

Usage: python tools/_gen_transcripts.py <n_convs> <avg_turns> <path> <out_json>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs, avg_turns, path, out = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    from ksql_spark.session import get_spark
    from ksql_spark.sources.transcripts import write_transcripts

    spark = get_spark(app_name="scaling_gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # 64 files so every parallelism level sees the same file granularity
        df = write_transcripts(spark, path, n_convs=n_convs, avg_turns=avg_turns, partitions=64)
        rows = df.count()
    else:
        rows = spark.read.parquet(path).count()
    with open(out, "w") as fh:
        json.dump({"rows": rows, "path": path}, fh)
    spark.stop()


if __name__ == "__main__":
    main()
