"""Semantic rule-set tests.

Mirrors the reference's builder rejection tests (select_builder_test.go:581+
— GROUP BY on stream w/o window, HAVING w/o GROUP BY, etc.) as plan-time
AnalysisError checks; same 6 select rules + 2 create rules + alias rules.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as Fn

from ksql_spark import (
    STREAM,
    TABLE,
    AnalysisError,
    Case,
    Count,
    Create,
    F,
    Insert,
    KType,
    Schema,
    SchemaField,
    Select,
    TimeUnit,
    TumblingWindow,
)


def test_groupby_on_stream_requires_window_unless_emit_changes():
    q = Select(F("a"), Count(F("b")).Alias("c")).From(Schema("s", STREAM)).GroupBy(F("a"))
    with pytest.raises(AnalysisError, match="WINDOW"):
        q.validate()
    q.EmitChanges()
    q.validate()  # ok now


def test_groupby_on_stream_with_window_ok():
    q = (
        Select(F("a"), Count(F("b")).Alias("c"))
        .From(Schema("s", STREAM))
        .WindowedBy(TumblingWindow(10, TimeUnit.SECONDS))
        .GroupBy(F("a"))
    )
    q.validate()


def test_having_requires_groupby():
    q = Select(F("a")).From(Schema("s", STREAM)).Having(Count(F("b")).Greater(1))
    with pytest.raises(AnalysisError, match="HAVING requires GROUP BY"):
        q.validate()


def test_aggregate_only_select_on_stream_requires_groupby():
    q = Select(Count(F("b")).Alias("c")).From(Schema("s", STREAM)).EmitChanges()
    with pytest.raises(AnalysisError, match="GROUP BY"):
        q.validate()


def test_window_not_allowed_on_table():
    q = (
        Select(F("a"), Count(F("b")).Alias("c"))
        .From(Schema("t", TABLE))
        .WindowedBy(TumblingWindow(10, TimeUnit.SECONDS))
        .GroupBy(F("a"))
    )
    with pytest.raises(AnalysisError, match="TABLE"):
        q.validate()


def test_emit_final_requires_window():
    q = (
        Select(F("a"), Count(F("b")).Alias("c"))
        .From(Schema("s", STREAM))
        .GroupBy(F("a"))
        .EmitFinal()
    )
    with pytest.raises(AnalysisError, match="EMIT FINAL"):
        q.validate()


def test_emit_modes_mutually_exclusive():
    with pytest.raises(AnalysisError, match="mutually exclusive"):
        Select(F("a")).From(Schema("s", STREAM)).EmitChanges().EmitFinal()
    with pytest.raises(AnalysisError, match="mutually exclusive"):
        Select(F("a")).From(Schema("s", STREAM)).EmitFinal().EmitChanges()


def test_mixed_agg_plain_requires_groupby():
    q = Select(F("a"), Count(F("b")).Alias("c")).From(Schema("t", TABLE))
    with pytest.raises(AnalysisError, match="GROUP BY"):
        q.validate()


def test_derived_fields_must_be_aliased():
    # aggregates (select_builder.go:779-782)
    q = Select(F("a"), Count(F("b"))).From(Schema("t", TABLE)).GroupBy(F("a"))
    with pytest.raises(AnalysisError, match="alias"):
        q.validate()
    # arithmetic
    q2 = Select(F("a").Add(1)).From(Schema("t", TABLE))
    with pytest.raises(AnalysisError, match="alias"):
        q2.validate()
    # CASE (case.go:81-83)
    q3 = Select(Case().When(F("a").Greater(1), "x").Else("y")).From(Schema("t", TABLE))
    with pytest.raises(AnalysisError, match="alias"):
        q3.validate()


def test_single_cte_limit():
    sub = Select(F("a")).From(Schema("s", STREAM))
    q = Select(F("a")).From(Schema("x", STREAM)).With("x", sub)
    with pytest.raises(AnalysisError, match="one CTE"):
        q.With("y", sub)


def test_create_stream_from_table_rejected():
    sel = Select(F("a")).From(Schema("t", TABLE))
    cb = Create(STREAM, "out").AsSelect(sel)
    with pytest.raises(AnalysisError, match="TABLE source"):
        cb.validate()


def test_create_table_from_unaggregated_stream_rejected():
    sel = Select(F("a")).From(Schema("s", STREAM))
    cb = Create(TABLE, "out").AsSelect(sel)
    with pytest.raises(AnalysisError, match="aggregation"):
        cb.validate()


def test_create_table_requires_primary_key():
    cb = Create(TABLE, "t").SchemaFields(SchemaField("id", KType.INT))
    with pytest.raises(AnalysisError, match="PRIMARY KEY"):
        cb.validate()
    Create(TABLE, "t2").SchemaFields(SchemaField("id", KType.INT, is_primary=True)).validate()


def test_insert_into_table_rejected():
    with pytest.raises(AnalysisError, match="TABLE"):
        Insert(TABLE, "t")


def test_insert_nil_value_rejected():
    # reference: nil values -> error (insert_builder_test.go)
    ib = Insert(STREAM, "s")
    with pytest.raises(AnalysisError, match="nil"):
        ib.Rows({"a": None})


def test_insert_requires_rows_xor_select():
    ib = Insert(STREAM, "s")
    with pytest.raises(AnalysisError):
        ib.validate()


def test_join_requires_on_condition():
    from ksql_spark.builder import JoinKind, JoinSpec

    with pytest.raises(AnalysisError, match="ON"):
        JoinSpec(JoinKind.INNER, Schema("r", TABLE), None)


def test_output_names_include_window_bounds():
    q = (
        Select(F("a"), Count(F("b")).Alias("cnt"))
        .From(Schema("s", STREAM))
        .WindowedBy(TumblingWindow(1, TimeUnit.MINUTES))
        .GroupBy(F("a"))
    )
    assert q.output_names() == ["window_start", "window_end", "a", "cnt"]


def test_negative_window_rejected():
    # reference pins invalid negative window (select_builder_test.go:524)
    with pytest.raises(AnalysisError, match="positive"):
        TumblingWindow(-10, TimeUnit.SECONDS)


def test_union_distinct_and_all(spark):
    from ksql_spark import F, STREAM, Schema, Select, compile_select

    a = spark.createDataFrame([(1,), (2,), (2,)], "x bigint")
    b = spark.createDataFrame([(2,), (3,)], "x bigint")
    u = (
        Select(F("x")).From(Schema("a", STREAM))
        .Union(Select(F("x")).From(Schema("b", STREAM)))
    )
    got = sorted(r["x"] for r in compile_select(u, sources={"a": a, "b": b}).collect())
    assert got == [1, 2, 3]
    ua = (
        Select(F("x")).From(Schema("a", STREAM))
        .UnionAll(Select(F("x")).From(Schema("b", STREAM)))
    )
    got = sorted(r["x"] for r in compile_select(ua, sources={"a": a, "b": b}).collect())
    assert got == [1, 2, 2, 2, 3]


def test_union_schema_mismatch_rejected(spark):
    from ksql_spark import F, STREAM, Schema, Select, compile_select
    from ksql_spark.errors import AnalysisError

    a = spark.createDataFrame([(1,)], "x bigint")
    b = spark.createDataFrame([(2,)], "y bigint")
    q = (
        Select(F("x")).From(Schema("a", STREAM))
        .Union(Select(F("y")).From(Schema("b", STREAM)))
    )
    with pytest.raises(AnalysisError, match="same columns"):
        compile_select(q, sources={"a": a, "b": b})


def test_union_distinct_streaming_rejected(spark, tmp_path):
    from ksql_spark import F, STREAM, Catalog, Schema, Select
    from ksql_spark.errors import AnalysisError
    from ksql_spark.operators.compile import compile_select as cs

    df = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "x bigint, ts_s string").select(
        "x", Fn.col("ts_s").cast("timestamp").alias("ts")
    )
    df.write.parquet(str(tmp_path / "t"))
    cat = Catalog(spark, root=str(tmp_path / "cat"))
    cat.register_parquet("t", str(tmp_path / "t"), ref=STREAM, event_time_col="ts")
    q = (
        Select(F("x")).From(Schema("t", STREAM))
        .Union(Select(F("x")).From(Schema("t", STREAM)))
    )
    with pytest.raises(AnalysisError, match="UNION ALL"):
        cs(q, spark=spark, catalog=cat, streaming=True)


def test_intersect_and_except(spark):
    from ksql_spark import F, STREAM, Schema, Select, compile_select

    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "x bigint")
    b = spark.createDataFrame([(2,), (3,), (4,)], "x bigint")
    i = (
        Select(F("x")).From(Schema("a", STREAM))
        .Intersect(Select(F("x")).From(Schema("b", STREAM)))
    )
    assert sorted(r["x"] for r in compile_select(i, sources={"a": a, "b": b}).collect()) == [2, 3]
    e = (
        Select(F("x")).From(Schema("a", STREAM))
        .Except(Select(F("x")).From(Schema("b", STREAM)))
    )
    assert [r["x"] for r in compile_select(e, sources={"a": a, "b": b}).collect()] == [1]
