"""Join lowering: stream-table (broadcast dimension) and stream-stream
(watermark + time-bound) joins — SURVEY.md §2.3 semantics."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as Fn

from ksql_spark import (
    STREAM,
    TABLE,
    AnalysisError,
    Catalog,
    Count,
    Create,
    F,
    Schema,
    Select,
    compile_select,
)
from ksql_spark.streaming.engine import PersistentQueryManager


def ts(m, s=0):
    return datetime.datetime(2026, 1, 1, 0, m, s)


def test_batch_join_types(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, l string")
    right = spark.createDataFrame([(1, "x"), (2, "y"), (4, "z")], "id int, r string")
    src = {"l": left, "r": right}

    inner = (
        Select(F("l.id"), F("r.r"))
        .From(Schema("l", TABLE).As("l"))
        .Join(Schema("r", TABLE).As("r"), F("l.id").Equal(F("r.id")))
    )
    assert sorted(r[0] for r in compile_select(inner, sources=src).collect()) == [1, 2]

    left_j = (
        Select(F("l.id"), F("r.r"))
        .From(Schema("l", TABLE).As("l"))
        .LeftJoin(Schema("r", TABLE).As("r"), F("l.id").Equal(F("r.id")))
    )
    rows = {r[0]: r[1] for r in compile_select(left_j, sources=src).collect()}
    assert rows == {1: "x", 2: "y", 3: None}

    outer = (
        Select(F("l.id"), F("r.id").Alias("rid"))
        .From(Schema("l", TABLE).As("l"))
        .OuterJoin(Schema("r", TABLE).As("r"), F("l.id").Equal(F("r.id")))
    )
    assert compile_select(outer, sources=src).count() == 4

    cross = (
        Select(F("l.id"), F("r.id").Alias("rid"))
        .From(Schema("l", TABLE).As("l"))
        .CrossJoin(Schema("r", TABLE).As("r"))
    )
    assert compile_select(cross, sources=src).count() == 9


def test_theta_join_condition(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    right = spark.createDataFrame([(1, 15), (2, 15)], "id int, w int")
    q = (
        Select(F("l.id"))
        .From(Schema("l", TABLE).As("l"))
        .Join(Schema("r", TABLE).As("r"), F("l.v").Greater(F("r.w")))
    )
    out = compile_select(q, sources={"l": left, "r": right})
    assert sorted(r[0] for r in out.collect()) == [2, 2]


def test_stream_table_join_streaming(spark, workdir, transcripts):
    """Stream enriched against a broadcast dimension table."""
    path, tdf = transcripts
    cat = Catalog(spark, root=f"{workdir}/cat")
    cat.register_parquet(
        "transcripts", path, ref=STREAM, event_time_col="ts", event_order_cols=["ts", "turn_idx"]
    )
    dim = spark.createDataFrame(
        [("user", 1), ("assistant", 2), ("tool", 3), ("system", 4)], "role string, role_rank int"
    )
    dimp = f"{workdir}/roles"
    dim.write.parquet(dimp)
    cat.register_parquet("roles", dimp, ref=TABLE, broadcast=True)

    mgr = PersistentQueryManager(spark, cat, workdir=f"{workdir}/eng", enable_metrics=False)
    csas = Create(STREAM, "enriched").AsSelect(
        Select(F("t.conv_id"), F("t.turn_idx"), F("t.text"), F("r.role_rank"))
        .From(Schema("transcripts", STREAM).As("t"))
        .Join(Schema("roles", TABLE).As("r"), F("t.role").Equal(F("r.role")))
        .EmitChanges()
    )
    mgr.create_as_select(csas, available_now=True)
    out = cat.read("enriched")
    expected = (
        tdf.join(dim, "role")
        .select("conv_id", "turn_idx", "text", "role_rank")
    )
    a = sorted(map(tuple, out.select("conv_id", "turn_idx", "text", "role_rank").collect()))
    b = sorted(map(tuple, expected.collect()))
    assert a == b


def test_stream_stream_join_time_bound(spark, workdir):
    """Self-join of a stream within a +/-30s window, keyed by conv_id."""
    rows = [
        ("c1", 0, "q1", ts(0, 0)),
        ("c1", 1, "a1", ts(0, 20)),   # within 30s of q1
        ("c1", 2, "a2", ts(2, 0)),    # outside
        ("c2", 0, "q2", ts(1, 0)),
        ("c2", 1, "a3", ts(1, 25)),   # within
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, ts timestamp")
    p = f"{workdir}/qs"
    df.write.parquet(p)
    cat = Catalog(spark, root=f"{workdir}/cat2")
    cat.register_parquet("turns", p, ref=STREAM, event_time_col="ts", event_order_cols=["ts", "turn_idx"])

    mgr = PersistentQueryManager(spark, cat, workdir=f"{workdir}/eng2", grace="1 hour", enable_metrics=False)
    csas = Create(STREAM, "paired").AsSelect(
        Select(F("l.conv_id"), F("l.text").Alias("q"), F("r.text").Alias("a"))
        .From(Schema("turns", STREAM).As("l"))
        .Join(
            Schema("turns", STREAM).As("r"),
            F("l.conv_id").Equal(F("r.conv_id")),
            within_seconds=30,
        )
        .Where(F("l.turn_idx").Less(F("r.turn_idx")))
        .EmitChanges()
    )
    mgr.create_as_select(csas, available_now=True)
    out = sorted(map(tuple, cat.read("paired").select("conv_id", "q", "a").collect()))
    assert out == [("c1", "q1", "a1"), ("c2", "q2", "a3")]


def test_outer_stream_stream_join_requires_window(spark, workdir):
    df = spark.createDataFrame(
        [("c1", datetime.datetime(2026, 1, 1))], "conv_id string, ts timestamp"
    )
    q = (
        Select(F("l.conv_id"))
        .From(Schema("s", STREAM).As("l"))
        .OuterJoin(Schema("s", STREAM).As("r"), F("l.conv_id").Equal(F("r.conv_id")))
    )
    with pytest.raises(AnalysisError, match="within"):
        compile_select(q, sources={"s": df}, streaming=True)


def test_broadcast_hint_applied(spark):
    """Dimension relations marked broadcast produce a BroadcastHashJoin plan."""
    from ksql_spark.sources.catalog import Relation

    big = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.createDataFrame([(i, f"v{i}") for i in range(5)], "k long, v string")
    cat = Catalog(spark)
    # register via sources override; emulate broadcast flag through metadata
    q = (
        Select(F("b.k"), F("d.v"))
        .From(Schema("big", TABLE).As("b"))
        .Join(Schema("dim", TABLE).As("d"), F("b.k").Equal(F("d.k")))
    )
    out = compile_select(q, sources={"big": big, "dim": dim})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # Catalyst auto-broadcasts the small side
