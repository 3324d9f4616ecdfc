"""sf0.1 drift check for the dedup/similarity family (VERDICT r3 #10).

The driver's DuckDB oracles for this family are brute-force O(n²) SQL —
fine at sf0.01 (500 docs), hours at sf0.1 (5,000 docs) because DuckDB
evaluates the quadratic list-intersection single-threaded.  The property
that could drift with scale is NOT the SQL mirror though — it is the
LSH band/probe tuning: does the bucketed scale path still find exactly
what the exhaustive path finds at 10x the corpus?  This script checks that
property directly, all-Spark (both sides distributed), plus the structural
invariants that need no oracle:

  1. minhash-LSH pairs        == exact n-gram-Jaccard pairs (recall/precision)
  2. simhash blocked pairs    == brute-force hamming pairs
  3. embedding LSH near-dup   == brute-force cosine near-dup (planted corpus)
  4. incremental dedup        == full-recompute subset (delta invariant)
  5. batched LSH ANN          == single-query LSH ANN per query (plan parity)
  6. cluster resolution       -> transitivity + representative invariants

Usage: python tools/sf01_dedup_check.py [sf_dir] [cores]
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


def main() -> None:
    from pyspark.sql import functions as F

    from ksql_spark.operators import dedup as dd
    from ksql_spark.operators.similarity import lsh_topk, lsh_topk_batch
    from ksql_spark.session import get_spark

    spark = get_spark(
        app_name="sf01_dedup_check",
        master=f"local[{CORES}]",
        shuffle_partitions=CORES,
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_docs, n_emb = docs.count(), emb.count()
    results = {}

    def check(name, ok, detail):
        results[name] = {"ok": bool(ok), **detail}
        print(("PASS " if ok else "FAIL ") + name + " " + json.dumps(detail), flush=True)

    t0 = time.time()
    with dd.persist_scope():
        lsh = sorted(map(tuple, dd.minhash_lsh_pairs(
            docs, n_hashes=48, bands=16, shingle_n=3, threshold=0.7).collect()))
    with dd.persist_scope():
        bf = sorted(map(tuple, dd.ngram_jaccard_pairs(
            docs, shingle_n=3, threshold=0.7).collect()))
    check("minhash_lsh_vs_exact", lsh == bf,
          {"pairs": len(lsh), "exact_pairs": len(bf), "sec": round(time.time() - t0, 1)})

    t0 = time.time()
    with dd.persist_scope():
        bl = sorted(map(tuple, dd.simhash_pairs_blocked(
            docs, bits=32, max_hamming=3).collect()))
    with dd.persist_scope():
        sb = sorted(map(tuple, dd.simhash_pairs(docs, bits=32, max_hamming=3).collect()))
    check("simhash_blocked_vs_exact", bl == sb,
          {"pairs": len(bl), "sec": round(time.time() - t0, 1)})

    # planted near-dups (same construction as the driver fixture)
    t0 = time.time()
    base = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x, i: x.cast("double") + ((i % 5) - 2).cast("double") * F.lit(0.004)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    with dd.persist_scope():
        lshp = sorted(map(tuple, dd.embedding_neardup_pairs_lsh(
            corpus, threshold=0.99, bands=6, rows_per_band=12, n_dims=64).collect()))
    bfp = sorted(map(tuple, dd.embedding_neardup_pairs(corpus, threshold=0.99).collect()))
    check("embed_lsh_vs_exact", lshp == bfp,
          {"pairs": len(lshp), "sec": round(time.time() - t0, 1)})

    t0 = time.time()
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    with dd.persist_scope():
        idx = dd.minhash_index(old, n_hashes=48, bands=16, shingle_n=3)
        inc = sorted(map(tuple, dd.minhash_lsh_pairs_incremental(
            new, idx, old, n_hashes=48, bands=16, shingle_n=3, threshold=0.7).collect()))
    want = sorted(t for t in lsh if t[0] % 10 == 0 or t[1] % 10 == 0)
    check("incremental_vs_full_subset", inc == want,
          {"pairs": len(inc), "sec": round(time.time() - t0, 1)})

    t0 = time.time()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    batch = lsh_topk_batch(emb.filter(F.col("vec_id") % 100 != 0), queries,
                           k=10, n_planes=8, n_dims=64)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine_sim"]))
    sample = [r["vec_id"] for r in queries.select("vec_id").limit(5).collect()]
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in queries.filter(F.col("vec_id").isin(sample)).collect()}
    ok = True
    for qid, qv in qvecs.items():
        single = [(i, r["vec_id"], r["cosine_sim"]) for i, r in enumerate(
            lsh_topk(emb.filter(F.col("vec_id") % 100 != 0), qv, k=10, n_planes=8).collect())]
        if sorted(got.get(qid, [])) != sorted(single):
            ok = False
    check("ann_batch_vs_single", ok,
          {"queries": len(got), "sampled": len(qvecs), "sec": round(time.time() - t0, 1)})

    t0 = time.time()
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b, _ in lsh] or [(0, 0)], "id_l long, id_r long")
    decisions = dd.dedup_clusters(docs, pairs_df).collect()
    lab = {r["doc_id"]: r["cluster_id"] for r in decisions}
    viol = sum(1 for a, b, _ in lsh if lab[a] != lab[b])          # connectivity
    rep_bad = sum(1 for r in decisions if r["keep"] != (r["cluster_id"] == r["doc_id"]))
    min_bad = 0
    clusters: dict = {}
    for r in decisions:
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    min_bad = sum(1 for c, members in clusters.items() if min(members) != c)
    check("clusters_invariants", viol == 0 and rep_bad == 0 and min_bad == 0,
          {"edge_violations": viol, "rep_violations": rep_bad,
           "min_violations": min_bad, "clusters": len(clusters),
           "sec": round(time.time() - t0, 1)})

    print(json.dumps({
        "metric": "sf01_dedup_family_drift_check",
        "sf_dir": SF_DIR, "cores": CORES, "n_docs": n_docs, "n_embeddings": n_emb,
        "all_pass": all(v["ok"] for v in results.values()),
        "checks": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
