"""Migrations: seeker-compatible up/down with persisted history
(reference: migrations/migrator.go, controller.go)."""

from __future__ import annotations

import pytest

from ksql_spark.migrations import (
    MigrationError,
    Migrator,
    create_migration,
    parse_migration,
)


@pytest.fixture()
def migdir(tmp_path):
    return str(tmp_path / "migrations")


def write_migration(migdir, version, name, up, down):
    path = create_migration(migdir, name, version=version)
    with open(path, "w") as fh:
        fh.write(f"-- +seeker Up\n{up}\n-- +seeker Down\n{down}\n")
    return path


def test_create_and_parse(migdir):
    p = create_migration(migdir, "init", version=100)
    assert p.endswith("100_init.sql")
    up, down = parse_migration(p)
    assert up == [] and down == []
    with pytest.raises(MigrationError):
        create_migration(migdir, "init", version=100)


def test_parse_requires_up_marker(tmp_path):
    p = str(tmp_path / "1_x.sql")
    with open(p, "w") as fh:
        fh.write("SELECT 1;")
    with pytest.raises(MigrationError, match="Up"):
        parse_migration(p)


def test_up_applies_in_order_and_skips_applied(spark, migdir, tmp_path):
    hist = str(tmp_path / "hist")
    write_migration(
        migdir, 100, "one",
        "CREATE TEMP VIEW mig_v1 AS SELECT 1 AS a;",
        "DROP VIEW mig_v1;",
    )
    write_migration(
        migdir, 200, "two",
        "CREATE TEMP VIEW mig_v2 AS SELECT a + 1 AS b FROM mig_v1;",
        "DROP VIEW mig_v2;",
    )
    m = Migrator(spark, migdir, hist)
    assert m.up() == ["100", "200"]
    assert spark.sql("SELECT b FROM mig_v2").collect()[0][0] == 2
    # AutoMigrate: re-running applies nothing (migrator.go:43-95)
    assert m.up() == []
    assert m.applied_versions() == ["100", "200"]


def test_down_reverts_last(spark, migdir, tmp_path):
    hist = str(tmp_path / "hist2")
    write_migration(
        migdir, 300, "three",
        "CREATE TEMP VIEW mig_v3 AS SELECT 3 AS c;",
        "DROP VIEW mig_v3;",
    )
    m = Migrator(spark, migdir, hist)
    m.up()
    assert m.down() == "300"
    assert m.applied_versions() == []
    assert not spark.catalog.tableExists("mig_v3")
    # down again: nothing applied
    assert m.down() is None
    # up re-applies after a down
    assert m.up() == ["300"]


def test_cli_create_and_status_parse(tmp_path):
    from ksql_spark.migrations_cli import _build_parser
    from ksql_spark.migrations import create_migration

    p = _build_parser()
    args = p.parse_args(["create", "add_x", "--dir", str(tmp_path)])
    assert args.cmd == "create" and args.name == "add_x"
    args = p.parse_args(["up", "--dir", str(tmp_path), "--master", "local[2]"])
    assert args.cmd == "up" and args.master == "local[2]"
    path = create_migration(str(tmp_path), "add_x", version=123)
    assert path.endswith("123_add_x.sql")
