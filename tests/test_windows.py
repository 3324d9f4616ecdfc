"""Window-operator semantics on crafted timestamps (batch lowering).

Mirrors window_test.go:17-52's three window kinds, but asserts computed
boundaries instead of rendered strings.  Streaming-mode windows are covered
by test_streaming.py.
"""

from __future__ import annotations

import datetime

import pytest

from ksql_spark import (
    STREAM,
    AnalysisError,
    Count,
    F,
    HoppingWindow,
    Schema,
    Select,
    SessionWindow,
    TimeUnit,
    TumblingWindow,
    compile_select,
)


def ts(m, s=0):
    return datetime.datetime(2026, 1, 1, 0, m, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        ("a", ts(0, 10)),
        ("a", ts(0, 50)),
        ("a", ts(1, 10)),
        ("b", ts(0, 30)),
        ("b", ts(5, 0)),   # session gap > 2m for key b
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp")


def run(q, df):
    out = compile_select(q, sources={"t": df}, event_time="ts")
    return sorted(
        ((r.window_start.minute, r.window_start.second, r.k, r.cnt) for r in out.collect())
    )


def test_tumbling_window_boundaries(spark, events):
    q = (
        Select(F("k"), Count(F("k")).Alias("cnt"))
        .From(Schema("t", STREAM))
        .WindowedBy(TumblingWindow(1, TimeUnit.MINUTES))
        .GroupBy(F("k"))
    )
    assert run(q, events) == [
        (0, 0, "a", 2),
        (0, 0, "b", 1),
        (1, 0, "a", 1),
        (5, 0, "b", 1),
    ]


def test_hopping_window_duplicates_rows(spark, events):
    q = (
        Select(F("k"), Count(F("k")).Alias("cnt"))
        .From(Schema("t", STREAM))
        .WindowedBy(HoppingWindow(60, 30, TimeUnit.SECONDS))
        .GroupBy(F("k"))
    )
    got = run(q, events)
    # event at 0:10 belongs to windows starting 23:59:30 (prev day) and 0:00
    assert (0, 0, "a", 2) in got  # 0:10 and 0:50 share the [0:00,1:00) window
    assert (0, 30, "a", 2) in got  # 0:50 and 1:10 share [0:30,1:30)


def test_session_window_gap_split(spark, events):
    q = (
        Select(F("k"), Count(F("k")).Alias("cnt"))
        .From(Schema("t", STREAM))
        .WindowedBy(SessionWindow(2, TimeUnit.MINUTES))
        .GroupBy(F("k"))
    )
    out = compile_select(q, sources={"t": events}, event_time="ts")
    rows = {(r.k, r.window_start.minute): (r.cnt, r.window_end.minute) for r in out.collect()}
    # a: one session 0:10..1:10 -> end = 1:10 + 2m = 3:10
    assert rows[("a", 0)] == (3, 3)
    # b: two sessions (gap 4m30s > 2m)
    assert rows[("b", 0)] == (1, 2)
    assert rows[("b", 5)] == (1, 7)


def test_hopping_advance_gt_size_rejected():
    with pytest.raises(AnalysisError, match="advance"):
        HoppingWindow(10, 20, TimeUnit.SECONDS)


def test_window_requires_event_time(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    q = (
        Select(F("k"), Count(F("v")).Alias("cnt"))
        .From(Schema("t", STREAM))
        .WindowedBy(TumblingWindow(1, TimeUnit.MINUTES))
        .GroupBy(F("k"))
    )
    with pytest.raises(AnalysisError, match="event-time"):
        compile_select(q, sources={"t": df})
