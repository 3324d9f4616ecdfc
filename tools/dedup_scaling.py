"""Second scaling-evidence pipeline: batch MinHash-LSH dedup at N vs 4N cores.

The streaming flagship (tools/scaling_bench.py) evidences the north rule on
the stateful path; this measures the batch training-data path — signature
computation + banded LSH join + exact-Jaccard verification over a synthetic
corpus with planted near-duplicates — at two parallelism levels.

Usage: python tools/dedup_scaling.py [n_docs]
Appends results to stdout as one JSON line; run via the wrapper below to
refresh the BENCH/BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CORES = int(os.environ.get("KSQL_SCALING_N", "2"))
N4_CORES = N_CORES * 4

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cores, data, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from ksql_spark.session import get_spark
from ksql_spark.operators.dedup import minhash_lsh_pairs

spark = get_spark(app_name=f"dedup_scale_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "16m",
                              "spark.local.dir": "/dev/shm/ksql_dedup_tmp"})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(data)
n_docs = docs.count()  # warm page cache + JVM
best = None
for _ in range(2):
    spark.catalog.clearCache()  # measure the FULL pipeline each run: the
    # operator persists its signature table, and Spark's CacheManager would
    # otherwise serve run 2 from run 1's cache
    t0 = time.time()
    n_pairs = minhash_lsh_pairs(docs, n_hashes=48, bands=16, shingle_n=3,
                                threshold=0.7).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
with open(out, "w") as fh:
    json.dump({"cores": cores, "n_docs": n_docs, "seconds": round(best, 3),
               "docs_per_sec": round(n_docs / best, 1), "pairs": n_pairs}, fh)
spark.stop()
"""

GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
n_docs, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from ksql_spark.session import get_spark

spark = get_spark(app_name="dedup_gen", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
words = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
         "lima mike november oscar papa quebec romeo sierra tango uniform "
         "victor whiskey xray yankee zulu stream table window join aggregate "
         "partition shuffle broadcast watermark checkpoint").split()
warr = F.array(*[F.lit(w) for w in words])
base = spark.range(n_docs).withColumn("doc_id", F.col("id"))
# ~80 words per doc, deterministic pseudo-random word picks
text = F.concat_ws(" ", F.transform(
    F.sequence(F.lit(1), F.lit(80)),
    lambda i: F.element_at(warr, (F.pmod(F.xxhash64(F.col("doc_id") * F.lit(131) + i), F.lit(len(words))) + 1).cast("int")),
))
docs = base.select("doc_id", text.alias("text"))
# plant near-duplicates: every 25th doc gets a copy with a 3-word prefix edit
plants = (docs.filter(F.col("doc_id") % 25 == 0)
          .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                  F.concat(F.lit("edited prefix tokens "), F.col("text")).alias("text")))
docs.unionByName(plants).repartition(64).write.mode("overwrite").parquet(path)
spark.stop()
"""


def _run_py(code: str, *args: str, log: str) -> None:
    # .replace, not %-format: the embedded code itself uses the % operator
    code = code.replace("%(repo)r", repr(REPO))
    with open(log, "w") as fh:
        subprocess.run(
            [sys.executable, "-c", code, *args],
            check=True, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT,
        )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    data = os.path.join(base, f"ksql_dedup_docs_{n_docs}")
    os.makedirs("/dev/shm/ksql_dedup_tmp", exist_ok=True)
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        _run_py(GEN, str(n_docs), data, log="/tmp/dedup_gen.log")

    results = {}
    for cores in (N_CORES, N4_CORES):
        out = tempfile.mktemp(suffix=".json")
        _run_py(WORKER, str(cores), data, out, log=f"/tmp/dedup_worker_{cores}.log")
        with open(out) as fh:
            results[cores] = json.load(fh)

    eff = (results[N4_CORES]["docs_per_sec"] / results[N_CORES]["docs_per_sec"]) / (
        N4_CORES / N_CORES
    )
    print(json.dumps({
        "metric": "dedup_scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "results": results,
    }))


if __name__ == "__main__":
    main()
