"""Migrations: seeker-compatible timestamped SQL migration runner.

Reimplements the reference's migration tool (migrations/migrator.go:43-95,
migrations/controller.go:16-72, cmd/cli/internal/create.go:20-31) on Spark:

  * migration files are ``{unix}_{name}.sql`` with ``-- +seeker Up`` /
    ``-- +seeker Down`` section markers (migrator.go:189-221);
  * applied versions are persisted in a system stream ``seeker_stream`` with
    columns (VERSION, UPDATED_AT) as RFC3339 strings
    (migrations/controller.go:17,28-32) — here a parquet append log;
  * ``up`` applies pending migrations in version order, skipping already
    applied ones (AutoMigrate semantics, migrator.go:43-95); ``down``
    reverts the most recent applied migration.

Statements run through ``spark.sql`` — the engine's raw-statement escape
hatch (reference analog: database.Execute, database/database.go:14-34).
"""

from __future__ import annotations

import datetime
import os
import re
import time

from pyspark.sql import SparkSession

from .errors import KsqlError

UP_MARKER = "-- +seeker Up"
DOWN_MARKER = "-- +seeker Down"

HISTORY_SCHEMA = "VERSION string, UPDATED_AT string"

_FILE_RE = re.compile(r"^(\d+)_(.+)\.sql$")


class MigrationError(KsqlError):
    pass


def create_migration(directory: str, name: str, version: int | None = None) -> str:
    """Create a timestamped migration skeleton (reference: cli `ksql create`)."""
    os.makedirs(directory, exist_ok=True)
    version = version or int(time.time())
    path = os.path.join(directory, f"{version}_{name}.sql")
    if os.path.exists(path):
        raise MigrationError(f"migration {path} already exists")
    with open(path, "w") as fh:
        fh.write(f"{UP_MARKER}\n\n{DOWN_MARKER}\n\n")
    return path


def parse_migration(path: str) -> tuple[list[str], list[str]]:
    """Split a migration file into Up and Down statement lists."""
    with open(path) as fh:
        content = fh.read()
    if UP_MARKER not in content:
        raise MigrationError(f"{path}: missing '{UP_MARKER}' marker")
    after_up = content.split(UP_MARKER, 1)[1]
    if DOWN_MARKER in after_up:
        up_part, down_part = after_up.split(DOWN_MARKER, 1)
    else:
        up_part, down_part = after_up, ""

    def statements(block: str) -> list[str]:
        return [s.strip() for s in block.split(";") if s.strip() and not s.strip().startswith("--")]

    return statements(up_part), statements(down_part)


class Migrator:
    """Apply/revert migrations with a persisted version history."""

    def __init__(self, spark: SparkSession, directory: str, history_path: str):
        self.spark = spark
        self.directory = directory
        self.history_path = history_path

    # -- history (the seeker_stream analog) --------------------------------

    def applied_versions(self) -> list[str]:
        if not os.path.exists(self.history_path):
            return []
        df = self.spark.read.schema(HISTORY_SCHEMA).parquet(self.history_path)
        # a version may appear multiple times (applied/reverted); count parity
        rows = df.collect()
        counts: dict[str, int] = {}
        for r in rows:
            counts[r["VERSION"]] = counts.get(r["VERSION"], 0) + 1
        return sorted(v for v, c in counts.items() if c % 2 == 1)

    def _record(self, version: str) -> None:
        now = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        self.spark.createDataFrame([(version, now)], HISTORY_SCHEMA).write.mode(
            "append"
        ).parquet(self.history_path)

    # -- discovery ----------------------------------------------------------

    def migrations(self) -> list[tuple[str, str]]:
        """Sorted (version, path) pairs found in the directory."""
        out = []
        if not os.path.isdir(self.directory):
            return out
        for f in os.listdir(self.directory):
            m = _FILE_RE.match(f)
            if m:
                out.append((m.group(1), os.path.join(self.directory, f)))
        return sorted(out)

    # -- apply / revert -------------------------------------------------------

    def up(self) -> list[str]:
        """Apply all pending migrations; returns applied versions
        (AutoMigrate semantics: already-applied versions are skipped)."""
        done = set(self.applied_versions())
        applied = []
        for version, path in self.migrations():
            if version in done:
                continue
            ups, _ = parse_migration(path)
            for stmt in ups:
                self.spark.sql(stmt)
            self._record(version)
            applied.append(version)
        return applied

    def down(self) -> str | None:
        """Revert the most recently applied migration; returns its version."""
        done = self.applied_versions()
        if not done:
            return None
        last = done[-1]
        path = dict(self.migrations()).get(last)
        if path is None:
            raise MigrationError(f"history references unknown migration version {last}")
        _, downs = parse_migration(path)
        for stmt in downs:
            self.spark.sql(stmt)
        self._record(last)  # second entry flips parity -> not applied
        return last
