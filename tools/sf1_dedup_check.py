"""sf1-scale (50k-doc) drift check for the dedup/similarity family.

VERDICT r4 #6: the sf0.1 check (tools/sf01_dedup_check.py) caught a real
cross-engine round() divergence at 10x; band tuning and probe recall drift
next at the following 10x.  No sf1 fixture exists in /root/testdata, so
this script EXPANDS the sf0.1 corpus deterministically (no external data,
no RNG outside a fixed seed):

  * documents: 10 replicas of the 5,000 sf0.1 docs.  Replica 0 is the
    original; replica r>0 rewrites every token t with xxhash64(t)%3==0 to
    ``t9r<r>`` (content-based, so the rewrite is a BIJECTION on token
    strings: within-replica Jaccard is exactly preserved, while any 3-gram
    crossing a rewritten token differs across replicas — cross-replica
    Jaccard ~0.17 << 0.7, so no cross-replica pairs).  doc_id = r*10^7 + id.
  * embeddings: replica 0 original (plus the planted +10^6 twins the sf0.1
    check uses); replicas 1..9 are seeded-numpy unit vectors (pairwise
    cosine ~0 — no accidental near-dups).  vec_id = r*10^7 + id.

Full brute force at 50k docs is O(n^2)=1.25e9 shingle intersections — not
a check, a heater.  The subset strategy keeps every property testable:
recall/precision of the bucketed paths is compared against the exhaustive
twin on the replica-0 slice (whose pair set is THE sf0.1 pair set, inside
a corpus under 10x bucket pressure), cross-replica leakage is asserted
zero / exactly-verified, and the incremental + cluster invariants run on
the full 50k corpus.

Usage: python tools/sf1_dedup_check.py [sf_dir] [cores]
Prints one PASS/FAIL line per check + a JSON summary; paste into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPLICAS = 10
RID = 10_000_000


def expand_documents(spark, docs):
    from pyspark.sql import functions as F

    r_df = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    toks = F.split(F.col("text"), " ")
    rewritten = F.concat_ws(
        " ",
        F.transform(
            toks,
            lambda t: F.when(
                F.pmod(F.abs(F.xxhash64(t)), 3) == 0,
                F.concat(t, F.lit("9r"), F.col("__r").cast("string")),
            ).otherwise(t),
        ),
    )
    return docs.crossJoin(r_df).select(
        (F.col("__r") * RID + F.col("doc_id")).alias("doc_id"),
        F.when(F.col("__r") == 0, F.col("text")).otherwise(rewritten).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def expand_embeddings(spark, emb):
    import numpy as np
    from pyspark.sql import functions as F

    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double") + ((i % 5) - 2).cast("double") * F.lit(0.004),
        ).alias("embedding"),
    )
    ids = [r[0] for r in emb.select("vec_id").collect()]
    dim = len(emb.select("embedding").first()[0])
    rows = []
    for r in range(1, REPLICAS):
        rng = np.random.default_rng(100_000 + r)
        mat = rng.standard_normal((len(ids), dim))
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        rows += [(r * RID + vid, [float(x) for x in vec]) for vid, vec in zip(ids, mat)]
    synth = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return base.unionByName(planted).unionByName(synth)


def main() -> None:
    from pyspark.sql import functions as F

    from ksql_spark.operators import dedup as dd
    from ksql_spark.session import get_spark

    spark = get_spark(
        app_name="sf1_dedup_check",
        master=f"local[{CORES}]",
        shuffle_partitions=max(CORES * 2, 32),
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}

    def check(name, ok, detail):
        results[name] = {"ok": bool(ok), **detail}
        print(("PASS " if ok else "FAIL ") + name + " " + json.dumps(detail), flush=True)

    docs01 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb01 = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    import tempfile

    work = tempfile.mkdtemp(prefix="sf1_dedup_")
    expand_documents(spark, docs01).write.parquet(os.path.join(work, "documents"))
    docs = spark.read.parquet(os.path.join(work, "documents"))
    emb = expand_embeddings(spark, emb01)
    n_docs = docs.count()
    print(f"expanded corpus: {n_docs} docs -> {work}", flush=True)

    # 1. LSH over the FULL 50k corpus vs the exhaustive twin on the
    # replica-{0,1} slice (10k docs).  The two-replica slice is the truth
    # set that also contains CROSS-replica near-dups: a doc whose tokens
    # all escape the rewrite is IDENTICAL in every replica (Jaccard 1.0
    # cross pairs are genuine — the first run of this check proved it:
    # exactly C(10,2)=45 cross pairs from one rewrite-invariant doc), so
    # cross pairs are verified against ground truth, not forbidden.
    t0 = time.time()
    with dd.persist_scope():
        lsh_full = sorted(
            map(
                tuple,
                dd.minhash_lsh_pairs(
                    docs, n_hashes=48, bands=16, shingle_n=3, threshold=0.7
                ).collect(),
            )
        )
    cross = [t for t in lsh_full if t[0] // RID != t[1] // RID]
    slice01 = [t for t in lsh_full if t[0] < 2 * RID and t[1] < 2 * RID]
    with dd.persist_scope():
        bf01 = sorted(
            map(
                tuple,
                dd.ngram_jaccard_pairs(
                    docs.filter(F.col("doc_id") < 2 * RID), shingle_n=3, threshold=0.7
                ).collect(),
            )
        )
    check(
        "lsh50k_replica01_vs_exact",
        slice01 == bf01,
        {
            "pairs_50k": len(lsh_full),
            "slice01_pairs": len(slice01),
            "exact_pairs": len(bf01),
            "cross_replica_pairs": len(cross),
            "sec": round(time.time() - t0, 1),
        },
    )

    # every replica must reproduce the replica-0 pair multiset (the token
    # rewrite is a bijection — Jaccard values are preserved exactly)
    t0 = time.time()
    per_replica_ok = True
    base_set = {(a, b) for a, b, _ in bf01 if a < RID and b < RID}
    for r in range(1, REPLICAS):
        rset = {
            (a - r * RID, b - r * RID)
            for a, b, _ in lsh_full
            if a // RID == r and b // RID == r
        }
        if rset != base_set:
            per_replica_ok = False
    check(
        "lsh50k_every_replica_matches",
        per_replica_ok,
        {"replicas": REPLICAS, "pairs_each": len(base_set), "sec": round(time.time() - t0, 1)},
    )

    # 2. simhash: blocked over 50k; replica-0 slice == exact on originals;
    # any cross-replica pair must be exactly-verified (hamming <= 3 is
    # possible across replicas — verify, don't forbid)
    t0 = time.time()
    with dd.persist_scope():
        bl = sorted(
            map(tuple, dd.simhash_pairs_blocked(docs, bits=32, max_hamming=3).collect())
        )
    with dd.persist_scope():
        sb0 = sorted(
            map(tuple, dd.simhash_pairs(docs01, bits=32, max_hamming=3).collect())
        )
    bl_r0 = [t for t in bl if t[0] < RID and t[1] < RID]
    check(
        "simhash50k_replica0_vs_exact",
        bl_r0 == sb0,
        {
            "pairs_50k": len(bl),
            "replica0_pairs": len(bl_r0),
            "exact_pairs": len(sb0),
            "sec": round(time.time() - t0, 1),
        },
    )

    # 3. embedding LSH over the 22k corpus: replica-0 slice (incl. planted
    # twins) == exhaustive on that slice; planted recall must be total
    t0 = time.time()
    with dd.persist_scope():
        lshp = sorted(
            map(
                tuple,
                dd.embedding_neardup_pairs_lsh(
                    emb, threshold=0.99, bands=6, rows_per_band=12, n_dims=64
                ).collect(),
            )
        )
    slice0 = emb.filter(F.col("vec_id") < RID)
    bfp = sorted(map(tuple, dd.embedding_neardup_pairs(slice0, threshold=0.99).collect()))
    lshp_r0 = [t for t in lshp if t[0] < RID and t[1] < RID]
    planted_ids = {r[0] for r in emb01.filter(F.col("vec_id") % 10 == 0).select("vec_id").collect()}
    found_planted = {a for a, b, _ in lshp_r0 if b == a + 1_000_000}
    check(
        "embed_lsh22k_replica0_vs_exact",
        lshp_r0 == bfp and found_planted == planted_ids,
        {
            "pairs_22k": len(lshp),
            "replica0_pairs": len(lshp_r0),
            "exact_pairs": len(bfp),
            "planted_found": len(found_planted),
            "planted_total": len(planted_ids),
            "sec": round(time.time() - t0, 1),
        },
    )

    # 4. incremental vs full subset on the FULL 50k corpus
    t0 = time.time()
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    with dd.persist_scope():
        idx = dd.minhash_index(old, n_hashes=48, bands=16, shingle_n=3)
        inc = sorted(
            map(
                tuple,
                dd.minhash_lsh_pairs_incremental(
                    new, idx, old, n_hashes=48, bands=16, shingle_n=3, threshold=0.7
                ).collect(),
            )
        )
    want = sorted(t for t in lsh_full if t[0] % 10 == 0 or t[1] % 10 == 0)
    check(
        "incremental50k_vs_full_subset",
        inc == want,
        {"pairs": len(inc), "sec": round(time.time() - t0, 1)},
    )

    # 5. cluster invariants over the full 50k pair set
    t0 = time.time()
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b, _ in lsh_full] or [(0, 0)], "id_l long, id_r long"
    )
    decisions = dd.dedup_clusters(docs, pairs_df).collect()
    lab = {r["doc_id"]: r["cluster_id"] for r in decisions}
    viol = sum(1 for a, b, _ in lsh_full if lab[a] != lab[b])
    rep_bad = sum(1 for r in decisions if r["keep"] != (r["cluster_id"] == r["doc_id"]))
    clusters: dict = {}
    for r in decisions:
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    min_bad = sum(1 for c, members in clusters.items() if min(members) != c)
    check(
        "clusters50k_invariants",
        viol == 0 and rep_bad == 0 and min_bad == 0,
        {
            "edge_violations": viol,
            "rep_violations": rep_bad,
            "min_violations": min_bad,
            "clusters": len(clusters),
            "sec": round(time.time() - t0, 1),
        },
    )

    print(
        json.dumps(
            {
                "metric": "sf1_dedup_family_drift_check",
                "sf_dir": SF_DIR,
                "cores": CORES,
                "n_docs": n_docs,
                "all_pass": all(v["ok"] for v in results.values()),
                "checks": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
