"""Deterministic sampling operators (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as Fn

from ksql_spark.operators.sampling import hash_sample, stratified_sample


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(10_000).select(
        Fn.col("id").alias("k"),
        (Fn.col("id") % 7).cast("string").alias("stratum"),
    )


def test_hash_sample_deterministic_and_calibrated(spark, rows):
    a = sorted(r["k"] for r in hash_sample(rows, "k", 0.2).collect())
    b = sorted(r["k"] for r in hash_sample(rows.repartition(13), "k", 0.2).collect())
    assert a == b  # identical under repartitioning
    assert 0.17 < len(a) / 10_000 < 0.23  # calibrated rate


def test_hash_sample_bands_are_nested(spark, rows):
    """rate bands nest: the 10% cut is a subset of the 20% cut — the
    property train/eval splits rely on."""
    small = {r["k"] for r in hash_sample(rows, "k", 0.1).collect()}
    big = {r["k"] for r in hash_sample(rows, "k", 0.2).collect()}
    assert small <= big


def test_hash_sample_edge_rates(spark, rows):
    assert hash_sample(rows, "k", 0.0).count() == 0
    assert hash_sample(rows, "k", 1.0).count() == 10_000
    with pytest.raises(ValueError):
        hash_sample(rows, "k", 1.5)


def test_stratified_quota_and_determinism(spark, rows):
    out = stratified_sample(rows, "stratum", "k", 25)
    counts = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(Fn.count("*").alias("n")).collect()}
    assert all(n == 25 for n in counts.values()) and len(counts) == 7
    again = stratified_sample(rows.repartition(5), "stratum", "k", 25)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_stratified_small_stratum_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k bigint, stratum string"
    )
    out = stratified_sample(df, "stratum", "k", 10)
    assert out.count() == 3  # quotas above stratum size keep everything
