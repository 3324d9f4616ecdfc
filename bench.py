"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is timed end-to-end (plan + execute + drain results via a
count/collect that forces full materialization).  The streaming flagship
measures the full persistent-query lifecycle: readStream -> windowed
stateful agg -> exactly-once changelog sink, and also reports throughput in
rows/sec under "extra".

Scaling evidence (N vs 4N cores) is produced by tools/scaling_bench.py and
recorded in BENCH/BASELINE.md — it needs two separate JVMs, so it can't run
inside this single-session harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "filter_project",
    "groupby_agg",
    "multi_join_revenue",
    "join_left",
    "latest_by_offset",
    "topk",
    "histogram",
    "window_tumbling",
    "window_hopping",
    "window_session",
    "streaming_tumbling_changelog",
    "streaming_emit_final",
    "streaming_session_changelog",
    "streaming_stream_stream_join",
    "streaming_topk_changelog",
    "streaming_cep_sequence",
    "cep_negation",
    "streaming_cep_negation",
    "cep_quantifier",
    "streaming_cep_quantifier",
    "cep_pattern_multi",
    "streaming_cep_pattern",
    "cep_pattern_negation",
    "streaming_cep_pattern_negation",
    "cep_pattern_optional",
    "cep_pattern_first",
    "streaming_cep_pattern_first",
    "cep_pattern_skip",
    "streaming_cep_pattern_skip",
    "cep_pattern_skip_next",
    "streaming_cep_pattern_skip_next",
    "streaming_cep_repeat4",
    "streaming_skew_salted_join",
    "streaming_topk_having",
    "streaming_session_final",
    "streaming_multi_agg_changelog",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_incremental",
    "chunk_documents",
    "cep_match_sequence",
    "embed_cosine_topk",
    "embed_neardup",
    "embed_lsh_ann",
    "embed_lsh_ann_batch",
    "embed_lsh_ann_served",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from ksql_spark.session import get_spark

    spark = get_spark(
        app_name="ksql_spark_bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # warm the JVM/codegen once on a trivial job so q1 isn't charged for it
    spark.range(1000).count()

    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        if name == "streaming_tumbling_changelog":
            input_rows = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()
            extra["streaming_input_rows"] = input_rows
            extra["streaming_rows_per_sec"] = round(input_rows / dt, 1)
        del n

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
