"""Incremental-dedup cost evidence: increment cost ∝ delta size.

Times three pipelines over the sf-dir documents table (default sf0.1,
5,000 docs), same hash family (48 hashes / 16 bands / 3-shingles):

  full       minhash_lsh_pairs over the whole corpus (what a naive daily
             re-dedup pays);
  index      one-time minhash_index build over the 90% corpus (amortized —
             paid once, appended per batch thereafter);
  increment  minhash_lsh_pairs_incremental of the 10% delta against the
             index (what the maintained-index pipeline pays per batch).

Also verifies the invariant end-to-end at this scale: the incremental pairs
are bit-equal to the full-recompute pairs restricted to pairs touching the
delta.

Usage: python tools/incremental_bench.py [sf_dir] [cores]
Prints one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> None:
    from pyspark.sql import functions as F

    from ksql_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
        persist_scope,
    )
    from ksql_spark.session import get_spark

    spark = get_spark(
        app_name="incremental_bench",
        master=f"local[{CORES}]",
        shuffle_partitions=CORES,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # SF_DIR may be a testdata dir (containing documents.parquet) or a direct
    # parquet table path (e.g. the 1M-doc corpus from tools/cluster_scaling.py)
    src = (
        SF_DIR
        if os.path.exists(os.path.join(SF_DIR, "_SUCCESS"))
        else os.path.join(SF_DIR, "documents.parquet")
    )
    docs = spark.read.parquet(src)
    n_docs = docs.count()  # warm page cache + JVM
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    n_new = new.count()
    kw = dict(n_hashes=48, bands=16, shingle_n=3, threshold=0.7)

    with persist_scope():
        t0 = time.time()
        full_pairs = sorted(map(tuple, minhash_lsh_pairs(docs, **kw).collect()))
        t_full = time.time() - t0

    t0 = time.time()
    idx = minhash_index(old, n_hashes=48, bands=16, shingle_n=3)
    idx_path = "/tmp/ksql_minhash_index"
    idx.write.mode("overwrite").parquet(idx_path)  # the maintained relation
    t_index = time.time() - t0

    idx_stored = spark.read.parquet(idx_path)
    with persist_scope():
        t0 = time.time()
        inc_pairs = sorted(
            map(tuple, minhash_lsh_pairs_incremental(new, idx_stored, old, **kw).collect())
        )
        t_inc = time.time() - t0

    want = sorted(t for t in full_pairs if t[0] % 10 == 0 or t[1] % 10 == 0)
    print(
        json.dumps(
            {
                "metric": "incremental_dedup_cost",
                "sf_dir": SF_DIR,
                "cores": CORES,
                "n_docs": n_docs,
                "n_delta": n_new,
                "full_recompute_sec": round(t_full, 3),
                "index_build_once_sec": round(t_index, 3),
                "increment_sec": round(t_inc, 3),
                "increment_over_full": round(t_inc / t_full, 3),
                "pairs_full": len(full_pairs),
                "pairs_increment": len(inc_pairs),
                "increment_equals_full_subset": inc_pairs == want,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
