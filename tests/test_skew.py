"""Skew handling: salted two-phase aggregation and salted joins must be
result-identical to their unsalted forms (north rule: salted-key handling
for skewed long conversations)."""

from __future__ import annotations

from pyspark.sql import functions as Fn

from ksql_spark.streaming.skew import (
    SALT_COL,
    add_salt,
    repartition_by_key,
    salted_join,
    salted_two_phase_agg,
)


def test_salted_agg_matches_plain(spark, transcripts):
    _, tdf = transcripts
    plain = (
        tdf.groupBy("conv_id")
        .agg(
            Fn.count("turn_idx").alias("n"),
            Fn.sum("turn_idx").alias("s"),
            Fn.min("ts").alias("mn"),
            Fn.max("ts").alias("mx"),
            Fn.avg("turn_idx").alias("av"),
        )
    )
    salted = salted_two_phase_agg(
        tdf,
        keys=["conv_id"],
        aggs={
            "n": ("count", "turn_idx"),
            "s": ("sum", "turn_idx"),
            "mn": ("min", "ts"),
            "mx": ("max", "ts"),
            "av": ("avg", "turn_idx"),
        },
        salt_buckets=8,
        salt_cols=["turn_idx"],
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.select("conv_id", "n", "s", "mn", "mx", "av").collect()))
    assert a == b


def test_salted_join_matches_plain(spark, transcripts):
    _, tdf = transcripts
    dim = tdf.select("conv_id").distinct().withColumn(
        "tag", Fn.concat(Fn.lit("t-"), Fn.col("conv_id"))
    )
    plain = tdf.join(dim, "conv_id").select("conv_id", "turn_idx", "tag")
    salted = salted_join(
        tdf, dim, key="conv_id", salt_buckets=4, left_salt_cols=["turn_idx"]
    ).select("conv_id", "turn_idx", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic(spark, transcripts):
    _, tdf = transcripts
    s1 = add_salt(tdf, 8, deterministic_cols=["conv_id", "turn_idx"]).select(SALT_COL)
    s2 = add_salt(tdf, 8, deterministic_cols=["conv_id", "turn_idx"]).select(SALT_COL)
    assert sorted(r[0] for r in s1.collect()) == sorted(r[0] for r in s2.collect())
    assert s1.agg(Fn.max(SALT_COL)).collect()[0][0] <= 7
    assert s1.agg(Fn.min(SALT_COL)).collect()[0][0] >= 0


def test_repartition_by_key(spark, transcripts):
    _, tdf = transcripts
    out = repartition_by_key(tdf, "conv_id", 8)
    assert out.rdd.getNumPartitions() == 8
    # all rows of one conversation land in one partition (co-location)
    parts = (
        out.withColumn("p", Fn.spark_partition_id())
        .groupBy("conv_id")
        .agg(Fn.countDistinct("p").alias("np"))
        .agg(Fn.max("np"))
        .collect()[0][0]
    )
    assert parts == 1
