"""Per-entry source-version hashes for the correctness registry.

VERDICT r4 #7: "driver-green but code-changed-since" was judge-audited
prose; this makes it mechanical.  Each ``queries()`` entry gets a version
hash over (a) the entry function's own source and (b) the source of every
``ksql_spark`` module the entry's body imports (the operators it
exercises).  The hash is stable across rounds as long as neither the
entry nor its operator modules change.

Usage:
    python tools/entry_versions.py hash            # print current hashes
    python tools/entry_versions.py record <round>  # after a driver round:
        for every entry with a green row in CORRECTNESS_r0<round>.json,
        record {hash, round} in BENCH/ENTRY_VERSIONS.json.  Run at the
        START of the next round (the tree is then exactly what the driver
        executed).
    python tools/entry_versions.py check           # flag entries whose
        current hash differs from their last driver-green recording (or
        that were never driver-proven at any recorded version)
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "BENCH", "ENTRY_VERSIONS.json")

_IMPORT_RE = re.compile(r"from\s+(ksql_spark(?:\.[A-Za-z_0-9.]+)?)\s+import\s+([A-Za-z_0-9, ()\n]+)")


def _module_file(modname: str) -> str | None:
    path = os.path.join(REPO, *modname.split(".")) + ".py"
    if os.path.exists(path):
        return path
    pkg = os.path.join(REPO, *modname.split("."), "__init__.py")
    return pkg if os.path.exists(pkg) else None


def _resolve_name_module(name: str) -> str | None:
    """Resolve ``from ksql_spark import X`` to X's defining module file."""
    try:
        import ksql_spark

        obj = getattr(ksql_spark, name.strip())
        mod = inspect.getmodule(obj)
        return getattr(mod, "__file__", None)
    except Exception:  # noqa: BLE001 — best-effort resolution
        return None


def entry_hash(fn) -> str:
    src = inspect.getsource(fn)
    files: set[str] = set()
    for m in _IMPORT_RE.finditer(src):
        modname, names = m.group(1), m.group(2)
        if modname == "ksql_spark":
            for nm in re.split(r"[,\s()]+", names):
                if nm:
                    f = _resolve_name_module(nm)
                    if f:
                        files.add(f)
        else:
            f = _module_file(modname)
            if f:
                files.add(f)
    h = hashlib.sha256(src.encode())
    for f in sorted(files):
        with open(f, "rb") as fh:
            h.update(hashlib.sha256(fh.read()).digest())
    return h.hexdigest()[:16]


def current_hashes() -> dict[str, str]:
    import __spark_entry__ as entry_mod

    return {name: entry_hash(fn) for name, fn in entry_mod.queries().items()}


def _load_registry() -> dict:
    if os.path.exists(REGISTRY):
        with open(REGISTRY) as f:
            return json.load(f)
    return {}


def record(round_no: int) -> None:
    corr_path = os.path.join(REPO, f"CORRECTNESS_r{round_no:02d}.json")
    with open(corr_path) as f:
        corr = json.load(f)
    reg = _load_registry()
    cur = current_hashes()
    n = 0
    for name, row in corr.items():
        if (
            name in cur
            and row.get("err") is None
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        ):
            reg[name] = {"hash": cur[name], "driver_green_round": round_no}
            n += 1
    os.makedirs(os.path.dirname(REGISTRY), exist_ok=True)
    with open(REGISTRY, "w") as f:
        json.dump(reg, f, indent=2, sort_keys=True)
    print(f"recorded {n} driver-green entries from round {round_no} -> {REGISTRY}")


def check() -> int:
    reg = _load_registry()
    cur = current_hashes()
    stale, unproven = [], []
    for name, h in cur.items():
        if name not in reg:
            unproven.append(name)
        elif reg[name]["hash"] != h:
            stale.append((name, reg[name]["driver_green_round"]))
    for name, rnd in stale:
        print(f"STALE    {name}: code changed since driver-green round {rnd}")
    for name in unproven:
        print(f"UNPROVEN {name}: no recorded driver-green version")
    if not stale and not unproven:
        print("all entries current at their last driver-green version")
    return len(stale)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "hash"
    if cmd == "hash":
        for k, v in current_hashes().items():
            print(f"{v}  {k}")
    elif cmd == "record":
        record(int(sys.argv[2]))
    elif cmd == "check":
        sys.exit(0 if check() == 0 else 0)  # informational, never gates
    else:
        print(__doc__)
        sys.exit(2)
