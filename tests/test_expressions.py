"""Expression-node lowering tests on tiny in-memory frames.

Mirrors the reference's per-node golden tests (conditionals_test.go,
arithmetic_test.go, case_test.go, expression_list_test.go) but asserts on
executed results instead of rendered strings — we own execution.
"""

from __future__ import annotations

import pytest

from ksql_spark import (
    STREAM,
    And,
    Case,
    F,
    Literal,
    Or,
    Schema,
    Select,
    compile_select,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a", None), (2, 20.0, "b", "x"), (3, 30.0, "c", "y"), (4, 40.0, "a", None)],
        "id int, val double, cat string, opt string",
    )


def run(q, df):
    return compile_select(q, sources={"t": df})


def test_comparisons(spark, df):
    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("val").Greater(15), F("val").LessEq(30))
    assert sorted(r.id for r in run(q, df).collect()) == [2, 3]

    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("cat").NotEqual("a"))
    assert sorted(r.id for r in run(q, df).collect()) == [2, 3]


def test_nil_rewrites_to_is_null(spark, df):
    # reference: = nil -> IS NULL (conditionals.go:183-193)
    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("opt").Equal(None))
    assert sorted(r.id for r in run(q, df).collect()) == [1, 4]
    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("opt").NotEqual(None))
    assert sorted(r.id for r in run(q, df).collect()) == [2, 3]


def test_in_not_in(spark, df):
    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("cat").In("a", "b"))
    assert sorted(r.id for r in run(q, df).collect()) == [1, 2, 4]
    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("cat").NotIn("a", "b"))
    assert sorted(r.id for r in run(q, df).collect()) == [3]


def test_and_or_nesting(spark, df):
    cond = Or(
        And(F("cat").Equal("a"), F("val").Greater(15)),
        F("id").Equal(3),
    )
    q = Select(F("id")).From(Schema("t", STREAM)).Where(cond)
    assert sorted(r.id for r in run(q, df).collect()) == [3, 4]


def test_arithmetic_ops(spark, df):
    q = Select(
        F("id"),
        F("val").Add(5).Alias("a"),
        F("val").Sub(5).Alias("s"),
        F("val").Mul(2).Alias("m"),
        F("val").Div(4).Alias("d"),
        F("id").Mod(2).Alias("r"),
        Literal(1).Sub(F("id")).Alias("lit_first"),
    ).From(Schema("t", STREAM)).Where(F("id").Equal(2))
    row = run(q, df).collect()[0]
    assert (row.a, row.s, row.m, row.d, row.r, row.lit_first) == (25.0, 15.0, 40.0, 5.0, 0, -1)


def test_case_when_branches(spark, df):
    q = Select(
        F("id"),
        Case()
        .When(F("val").Greater(35), "big")
        .When(F("val").Greater(15), "mid")
        .Else("small")
        .Alias("band"),
    ).From(Schema("t", STREAM))
    got = {r.id: r.band for r in run(q, df).collect()}
    assert got == {1: "small", 2: "mid", 3: "mid", 4: "big"}


def test_case_without_else_gives_null(spark, df):
    q = Select(F("id"), Case().When(F("id").Equal(1), "one").Alias("x")).From(Schema("t", STREAM))
    got = {r.id: r.x for r in run(q, df).collect()}
    assert got == {1: "one", 2: None, 3: None, 4: None}


def test_is_true_false(spark):
    bdf = spark.createDataFrame([(1, True), (2, False), (3, None)], "id int, flag boolean")
    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("flag").IsTrue())
    assert [r.id for r in compile_select(q, sources={"t": bdf}).collect()] == [1]
    q = Select(F("id")).From(Schema("t", STREAM)).Where(F("flag").IsFalse())
    assert [r.id for r in compile_select(q, sources={"t": bdf}).collect()] == [2]


def test_alias_and_qualified_fields(spark, df):
    q = Select(F("t.id").Alias("ident"), F("cat")).From(Schema("t", STREAM).As("t"))
    out = run(q, df)
    assert out.columns == ["ident", "cat"]


def test_order_by_multi_key(spark, df):
    q = Select(F("id"), F("cat")).From(Schema("t", STREAM)).OrderBy(
        F("cat").Asc(), F("id").Desc()
    )
    assert [r.id for r in run(q, df).collect()] == [4, 1, 2, 3]


def test_limit(spark, df):
    q = Select(F("id")).From(Schema("t", STREAM)).OrderBy(F("id").Asc()).Limit(2)
    assert [r.id for r in run(q, df).collect()] == [1, 2]
