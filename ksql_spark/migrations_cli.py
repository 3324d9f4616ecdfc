"""Migrations CLI: ``python -m ksql_spark.migrations_cli <create|up|down>``.

Mirrors the reference's cobra CLI (cmd/cli/internal/root.go:14-45,
create.go:20-31, up.go, down.go): ``create <name>`` writes a timestamped
skeleton, ``up`` applies pending migrations, ``down`` reverts the last one.
The reference reads --db_url/.env for its ksqlDB endpoint; the Spark analog
is --warehouse (Spark SQL warehouse dir) + --history (version-log path),
both env-overridable (KSQL_MIGRATIONS_DIR / KSQL_MIGRATIONS_HISTORY).
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "--dir",
        default=os.environ.get("KSQL_MIGRATIONS_DIR", "migrations"),
        help="migration-files directory (default: ./migrations)",
    )
    common.add_argument(
        "--history",
        default=os.environ.get("KSQL_MIGRATIONS_HISTORY", "migrations/_history"),
        help="applied-versions log path (the seeker_stream analog)",
    )
    common.add_argument("--master", default="local[*]", help="Spark master for up/down")

    p = argparse.ArgumentParser(
        prog="ksql-migrate", description="seeker-style SQL migrations on Spark"
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("create", parents=[common], help="create a timestamped migration skeleton")
    c.add_argument("name")
    sub.add_parser("up", parents=[common], help="apply all pending migrations")
    sub.add_parser("down", parents=[common], help="revert the most recent applied migration")
    sub.add_parser("status", parents=[common], help="list migrations and applied state")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from .migrations import Migrator, create_migration

    if args.cmd == "create":
        path = create_migration(args.dir, args.name)
        print(path)
        return 0

    from .session import get_spark

    spark = get_spark(app_name="ksql_migrations", master=args.master)
    try:
        m = Migrator(spark, args.dir, args.history)
        if args.cmd == "up":
            applied = m.up()
            print("applied:", ", ".join(applied) if applied else "(none pending)")
        elif args.cmd == "down":
            reverted = m.down()
            print("reverted:", reverted if reverted else "(nothing applied)")
        elif args.cmd == "status":
            done = set(m.applied_versions())
            for version, path in m.migrations():
                mark = "applied" if version in done else "pending"
                print(f"{version}  {mark}  {path}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
