"""Duplicate-cluster resolution: pairs -> connected components -> keep/drop.

The property pair-output gets wrong is transitivity: A~B and B~C must put
A, B, C in ONE cluster even though the pair (A, C) was never emitted.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ksql_spark.operators.dedup import connected_components, dedup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_l bigint, id_r bigint")


def _labels(df):
    return {r["id"]: r["cluster"] for r in df.collect()}


def test_chain_transitivity(spark):
    # A~B, B~C: pair output alone would keep A and C both; clusters must not.
    cc = _labels(connected_components(_pairs(spark, [(1, 2), (2, 3)])))
    assert cc == {2: 1, 3: 1}


def test_two_components_and_ordering(spark):
    cc = _labels(
        connected_components(_pairs(spark, [(5, 4), (4, 9), (20, 30), (30, 21)]))
    )
    assert cc == {5: 4, 9: 4, 21: 20, 30: 20}


def test_long_path_converges_in_log_rounds(spark):
    # path 0-1-2-...-63: diameter 63, but star contraction converges in
    # O(log n) rounds — max_rounds=25 must be plenty.
    n = 64
    cc = _labels(connected_components(_pairs(spark, [(i, i + 1) for i in range(n - 1)])))
    assert cc == {i: 0 for i in range(1, n)}


def test_self_loops_and_duplicate_edges_ignored(spark):
    cc = _labels(
        connected_components(_pairs(spark, [(7, 7), (1, 2), (2, 1), (1, 2)]))
    )
    assert cc == {2: 1}


def test_empty_pairs(spark):
    assert connected_components(_pairs(spark, [])).count() == 0


def test_dedup_clusters_keep_policy(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id bigint"
    )
    # {0,1,2} via chain, {4,5} pair, 3 singleton
    pairs = _pairs(spark, [(0, 1), (1, 2), (4, 5)])
    out = dedup_clusters(docs, pairs).orderBy("doc_id").collect()
    got = [(r["doc_id"], r["cluster_id"], r["keep"]) for r in out]
    assert got == [
        (0, 0, True),
        (1, 0, False),
        (2, 0, False),
        (3, 3, True),
        (4, 4, True),
        (5, 4, False),
    ]


def test_dedup_clusters_end_to_end_minhash(spark):
    # three near-identical docs forming a chain through shared text + one
    # distinct doc; minhash pairs -> clusters keeps exactly one of the trio.
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = spark.createDataFrame(
        [
            (10, base),
            (11, base + " extra tail words here"),
            (12, base + " extra tail words here and more"),
            (99, "completely different content about spark structured streaming " * 8),
        ],
        "doc_id bigint, text string",
    )
    from ksql_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, n_hashes=48, bands=16, shingle_n=3, threshold=0.7)
    out = dedup_clusters(docs, pairs)
    kept = sorted(r["doc_id"] for r in out.filter(F.col("keep")).collect())
    assert kept == [10, 99]
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert clusters[10] == clusters[11] == clusters[12] == 10
    assert clusters[99] == 99
