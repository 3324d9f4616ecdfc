"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 through Spark, the matching
``oracle_sql()`` through DuckDB (tables pre-registered as views like the
driver does), and compares row count, column-name set, and an
order-insensitive multiset of normalized values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_value(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def frame_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm_value(row[i]) for i in order))
    return sorted(out, key=repr)


def main():
    import __spark_entry__ as entry_mod
    from ksql_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # per-entry source-version hash (VERDICT r4 #7): lets the judge match a
    # transcript line to the exact entry+operator source it verified
    try:
        from tools.entry_versions import current_hashes

        vhash = current_hashes()
    except Exception:  # noqa: BLE001
        vhash = {}
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(
                f"pass* {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) "
                f"[v={vhash.get(name, '?')}]"
            )
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        ok = True
        if len(srows) != len(orows):
            ok = False
            print(f"FAIL  {name}: row count spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if ok:
            a = frame_multiset(scols, srows)
            b = frame_multiset(ocols, orows)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
        if ok:
            print(
                f"pass  {name} ({len(srows)} rows, {time.time()-t0:.1f}s) "
                f"[v={vhash.get(name, '?')}]"
            )
        else:
            failures.append(name)

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("ALL GREEN")
    spark.stop()


if __name__ == "__main__":
    main()
