"""Engine-settings sweep at high core counts (VERDICT r4 #5).

The 4->16 scaling pair sat at 0.722 in round 4, host-attributed (a pure-CPU
md5 control shows the VM itself delivers ~0.80 at 8->32).  One engine lever
was untested: shuffle-partition count and RocksDB state-store sizing at
high core counts.  This sweep isolates them: the flagship streaming job
(tools/_scaling_worker.py — identical plan, fresh JVM per run) at local[16]
across a config matrix, then the 4->16 pair re-measured with the best
config applied to BOTH levels.

Usage: python tools/tuning_sweep.py [n_convs] [avg_turns]
Prints one JSON line per run + a summary table; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str, log: str) -> None:
    with open(log, "w") as fh:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", script), *args],
            check=True,
            cwd=REPO,
            stdout=fh,
            stderr=subprocess.STDOUT,
        )


def generate(n_convs: int, avg_turns: int) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    path = os.path.join(base, f"ksql_tuning_transcripts_{n_convs}_{avg_turns}")
    if os.path.isdir(path) and os.listdir(path):
        return path
    out = tempfile.mktemp(suffix=".json")
    _run(
        "_gen_transcripts.py", str(n_convs), str(avg_turns), path, out,
        log=os.path.join(tempfile.gettempdir(), "ksql_tuning_gen.log"),
    )
    return path


def run_worker(cores: int, data: str, tune: dict) -> dict:
    out = tempfile.mktemp(suffix=".json")
    _run(
        "_scaling_worker.py", str(cores), data, out, json.dumps(tune),
        log=os.path.join(tempfile.gettempdir(), f"ksql_tuning_worker_{cores}.log"),
    )
    with open(out) as fh:
        return json.load(fh)


CONFIGS = {
    "default(4xcores,rocks-default)": {},
    "shuffle=1xcores": {"shuffle_partitions_factor": 1},
    "shuffle=2xcores": {"shuffle_partitions_factor": 2},
    "rocks-tuned": {
        "extra_conf": {
            "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "64",
            "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber": "3",
            "spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB": "256",
        }
    },
    "shuffle=2xcores+rocks-tuned": {
        "shuffle_partitions_factor": 2,
        "extra_conf": {
            "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "64",
            "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber": "3",
            "spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB": "256",
        }
    },
}


def resolve(cfg: dict, cores: int) -> dict:
    tune = {}
    if "shuffle_partitions_factor" in cfg:
        tune["shuffle_partitions"] = cores * cfg["shuffle_partitions_factor"]
    if "extra_conf" in cfg:
        tune["extra_conf"] = cfg["extra_conf"]
    return tune


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    avg_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    data = generate(n_convs, avg_turns)

    sweep = {}
    for name, cfg in CONFIGS.items():
        r = run_worker(16, data, resolve(cfg, 16))
        sweep[name] = r
        print(json.dumps({"config": name, "cores": 16, **{k: r[k] for k in ("seconds", "turns_per_sec")}}), flush=True)

    best = max(sweep, key=lambda k: sweep[k]["turns_per_sec"])
    print(f"# best@16: {best}", flush=True)

    pair = {}
    for cores in (4, 16):
        r = run_worker(cores, data, resolve(CONFIGS[best], cores))
        pair[cores] = r
        print(json.dumps({"config": f"best:{best}", "cores": cores, **{k: r[k] for k in ("seconds", "turns_per_sec")}}), flush=True)
    eff = (pair[16]["turns_per_sec"] / pair[4]["turns_per_sec"]) / 4

    print(
        json.dumps(
            {
                "metric": "tuning_sweep_4_to_16",
                "input": {"n_convs": n_convs, "avg_turns": avg_turns,
                          "rows": pair[16]["input_rows"]},
                "sweep_at_16": {k: v["turns_per_sec"] for k, v in sweep.items()},
                "best_config": best,
                "pair_best": {str(c): pair[c]["turns_per_sec"] for c in pair},
                "efficiency_4_16_best": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
