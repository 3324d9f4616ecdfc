"""Catalog: LIST/DESCRIBE/DROP, QUERYABLE twin, pre-flight schema checks
(reference: §2.1 DDL surface + §2.10 reflection linter)."""

from __future__ import annotations

import pytest

from ksql_spark import (
    STREAM,
    TABLE,
    Catalog,
    CatalogError,
    Create,
    Insert,
    KType,
    SchemaError,
    SchemaField,
)
from ksql_spark.sources.catalog import QUERYABLE_PREFIX, Relation


@pytest.fixture()
def cat(spark, workdir):
    return Catalog(spark, root=workdir)


def test_create_list_describe_drop(cat):
    cb = Create(STREAM, "example_stream").SchemaFields(
        SchemaField("ID", KType.INT), SchemaField("TOKEN", KType.BYTES)
    )
    rel = cat.create(cb)
    assert rel.ref == STREAM
    assert [r.name for r in cat.list(STREAM)] == ["example_stream"]

    d = cat.describe("example_stream")
    assert d["kind"] == "STREAM"
    assert d["fields"] == [
        {"name": "ID", "type": "int", "primary": False},
        {"name": "TOKEN", "type": "binary", "primary": False},
    ]

    cat.drop("example_stream")
    assert not cat.exists("example_stream")
    with pytest.raises(CatalogError):
        cat.get("example_stream")


def test_create_table_with_primary_key(cat):
    cb = Create(TABLE, "example_table").SchemaFields(
        SchemaField("ID", KType.INT, is_primary=True), SchemaField("NAME", KType.STRING)
    )
    rel = cat.create(cb)
    assert rel.primary_key == "ID"
    d = cat.describe("example_table")
    assert d["fields"][0]["primary"] is True


def test_duplicate_relation_rejected(cat):
    cb = Create(STREAM, "s1").SchemaFields(SchemaField("a", KType.INT))
    cat.create(cb)
    with pytest.raises(CatalogError, match="already exists"):
        cat.create(Create(STREAM, "S1").SchemaFields(SchemaField("a", KType.INT)))


def test_drop_removes_queryable_twin(cat, spark):
    cat.register(Relation(name="t", ref=TABLE, path="/nonexistent"))
    cat.register(Relation(name=QUERYABLE_PREFIX + "t", ref=TABLE, path="/nonexistent"))
    cat.drop("t")
    assert not cat.exists("t")
    assert not cat.exists(QUERYABLE_PREFIX + "t")


def test_schema_preflight_check(cat, spark, workdir):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    p = f"{workdir}/rel"
    df.write.parquet(p)
    cat.register_parquet("rel", p)
    cat.check_schema("rel", [SchemaField("id", KType.INT), SchemaField("name", KType.STRING)])
    with pytest.raises(SchemaError, match="not in relation"):
        cat.check_schema("rel", [SchemaField("missing", KType.INT)])
    with pytest.raises(SchemaError, match="declared"):
        cat.check_schema("rel", [SchemaField("id", KType.STRING)])


def test_insert_rows_and_read_back(cat, spark, workdir):
    cb = Create(STREAM, "tx").SchemaFields(
        SchemaField("ID", KType.BIGINT), SchemaField("AMOUNT", KType.DOUBLE)
    )
    cat.create(cb)
    from ksql_spark.streaming.engine import PersistentQueryManager

    mgr = PersistentQueryManager(spark, cat, workdir=f"{workdir}/e", enable_metrics=False)
    mgr.insert(Insert(STREAM, "tx").Rows({"ID": 1, "AMOUNT": 9.5}, {"ID": 2, "AMOUNT": 1.25}))
    rows = sorted(map(tuple, cat.read("tx").collect()))
    assert rows == [(1, 9.5), (2, 1.25)]


def test_insert_struct(cat, spark, workdir):
    class Tx:
        def __init__(self):
            self.ID = 7
            self.AMOUNT = 3.5

    cat.create(
        Create(STREAM, "tx2").SchemaFields(
            SchemaField("ID", KType.BIGINT), SchemaField("AMOUNT", KType.DOUBLE)
        )
    )
    from ksql_spark.streaming.engine import PersistentQueryManager

    mgr = PersistentQueryManager(spark, cat, workdir=f"{workdir}/e2", enable_metrics=False)
    mgr.insert(Insert(STREAM, "tx2").InsertStruct(Tx()))
    assert [tuple(r) for r in cat.read("tx2").collect()] == [(7, 3.5)]


def test_read_stream_on_table_rejected(cat, spark, workdir):
    df = spark.createDataFrame([(1,)], "id int")
    p = f"{workdir}/tbl"
    df.write.parquet(p)
    cat.register_parquet("tbl", p, ref=TABLE)
    with pytest.raises(CatalogError, match="TABLE"):
        cat.read_stream("tbl")


def test_topic_surface(spark, tmp_path):
    """SHOW TOPICS / DESCRIBE topic (reference: topics/specification.go:17-54)."""
    from ksql_spark import STREAM, Catalog

    p = str(tmp_path / "raw_events")
    spark.range(10).write.parquet(p)
    cat = Catalog(spark, root=str(tmp_path / "cat"))
    cat.register_topic("raw_events_topic", p)
    cat.register_parquet("ev", p, ref=STREAM)
    topics = cat.list_topics()
    names = {t["name"] for t in topics}
    assert "raw_events_topic" in names and "raw_events" in names
    d = cat.describe_topic("raw_events_topic")
    assert d["bytes"] > 0 and d["partitions"] >= 1
