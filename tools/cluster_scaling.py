"""End-to-end dedup-decision evidence at the million-doc scale.

Runs the FULL training-data dedup pipeline — normalize -> shingle ->
minhash -> banded LSH join -> exact-Jaccard verify -> connected components
-> canonical keep/drop — over a synthetic corpus with planted duplicate
CHAINS (A ~ B ~ C where only consecutive edits are near-dups), and checks
the decisions exactly:

  * every planted chain must collapse to ONE cluster (transitive closure —
    the property pair output alone gets wrong);
  * keep = the minimum doc id of the chain;
  * everything else stays a singleton.

Usage: python tools/cluster_scaling.py [n_docs] [cores]
Prints one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
n_docs, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from ksql_spark.session import get_spark

spark = get_spark(app_name="cluster_gen", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
words = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
         "lima mike november oscar papa quebec romeo sierra tango uniform "
         "victor whiskey xray yankee zulu stream table window join aggregate "
         "partition shuffle broadcast watermark checkpoint").split()
warr = F.array(*[F.lit(w) for w in words])
base = spark.range(n_docs).withColumn("doc_id", F.col("id"))
text = F.concat_ws(" ", F.transform(
    F.sequence(F.lit(1), F.lit(80)),
    lambda i: F.element_at(warr, (F.pmod(F.xxhash64(F.col("doc_id") * F.lit(131) + i), F.lit(len(words))) + 1).cast("int")),
))
docs = base.select("doc_id", text.alias("text"))
# duplicate CHAINS: every 25th doc A gets B = edit(A) and C = edit(B).
# B keeps ~77/80 of A's words; C keeps ~74/80 of B's — consecutive links
# are clear near-dups, so the chain must merge transitively.
src = docs.filter(F.col("doc_id") %% 25 == 0)
b = src.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
               F.concat(F.lit("edited prefix tokens "), F.col("text")).alias("text"))
c = b.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
             F.concat(F.lit("second edit pass "), F.col("text")).alias("text"))
docs.unionByName(b).unionByName(c).repartition(64).write.mode("overwrite").parquet(path)
spark.stop()
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
cores, data, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
shuffle_dir = sys.argv[4] if len(sys.argv) > 4 else None
from pyspark.sql import functions as F
from ksql_spark.session import get_spark
from ksql_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs, persist_scope

spark = get_spark(app_name=f"cluster_scale_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "16m",
                              **({"spark.local.dir": shuffle_dir} if shuffle_dir else {})})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(data)
n_docs = docs.count()  # warm page cache + JVM
t0 = time.time()
# persist_scope: every operator-internal persisted block is released when
# the pipeline's results are materialized (no MEMORY_AND_DISK leak)
with persist_scope():
    pairs = minhash_lsh_pairs(docs, n_hashes=48, bands=16, shingle_n=3, threshold=0.7)
    decisions = dedup_clusters(docs, pairs)
    agg = decisions.groupBy().agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("dropped"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).first()
    dt = time.time() - t0
    # chain check: every planted chain (base, base+10M, base+20M) -> one cluster
    bad = (decisions.filter(F.col("doc_id") >= 10_000_000)
           .withColumn("expect", F.pmod(F.col("doc_id"), 10_000_000))
           .filter(F.col("cluster_id") != F.col("expect")).count())
with open(out, "w") as fh:
    json.dump({"cores": cores, "n_docs": n_docs, "seconds": round(dt, 3),
               "docs_per_sec": round(n_docs / dt, 1),
               "dropped": agg["dropped"], "clusters": agg["clusters"],
               "chain_violations": bad}, fh)
spark.stop()
"""


def _run_py(code: str, *args: str, log: str) -> None:
    code = code.replace("%(repo)r", repr(REPO)).replace("%%", "%")
    with open(log, "w") as fh:
        subprocess.run(
            [sys.executable, "-c", code, *args],
            check=True, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT,
        )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # shuffle-local dir follows the SAME /dev/shm-or-tmp fallback as the
    # data dir (ADVICE r3: unconditional /dev/shm crashed shm-less hosts)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    data = os.path.join(base, f"ksql_cluster_docs_{n_docs}")
    shuffle_dir = os.path.join(base, "ksql_dedup_tmp")
    os.makedirs(shuffle_dir, exist_ok=True)
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        _run_py(GEN, str(n_docs), data, log="/tmp/cluster_gen.log")

    out = tempfile.mktemp(suffix=".json")
    _run_py(WORKER, str(cores), data, out, shuffle_dir,
            log=f"/tmp/cluster_worker_{cores}.log")
    with open(out) as fh:
        r = json.load(fh)
    n_chains = n_docs // 25 + (1 if n_docs % 25 else 0)
    r["expected_dropped"] = 2 * n_chains
    r["decisions_exact"] = (
        r["chain_violations"] == 0 and r["dropped"] == r["expected_dropped"]
    )
    print(json.dumps({"metric": "dedup_cluster_resolution_1M", **r}))


if __name__ == "__main__":
    main()
