"""Load-guarded bench runner (r7 measurement discipline).

The sandbox shares a host with noisy neighbors; fsync-heavy streaming
entries inflate 2-5x under external load (BENCH_r06's driver run had the
same problem).  This runner waits for a quiet 1-minute loadavg before each
bench invocation, records the loadavg before/after alongside each sample,
and maintains a running per-query minimum in the output JSON.

Usage: python tools/bench_guarded.py <out.json> <n_runs> [max_wait_s]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

OUT = sys.argv[1]
N = int(sys.argv[2])
MAX_WAIT = int(sys.argv[3]) if len(sys.argv) > 3 else 900
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> None:
    state: dict = {"samples": [], "queries_min": {}, "total_min": None}
    if os.path.exists(OUT):
        state = json.load(open(OUT))
    for run in range(N):
        waited = 0
        while load1() > 1.0 and waited < MAX_WAIT:
            time.sleep(15)
            waited += 15
        l0 = load1()
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO,
        )
        l1 = load1()
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            parsed = {"error": p.stderr[-500:]}
        state["samples"].append(
            {"load_before": l0, "load_after": l1, "wall": round(time.time() - t0, 1),
             "parsed": parsed}
        )
        if "queries" in parsed:
            for k, v in parsed["queries"].items():
                cur = state["queries_min"].get(k)
                state["queries_min"][k] = v if cur is None else min(cur, v)
            state["total_min"] = round(sum(state["queries_min"].values()), 3)
        with open(OUT, "w") as fh:
            json.dump(state, fh, indent=1)
        sys.stderr.write(
            f"run {run}: total={parsed.get('value')} load {l0}->{l1} "
            f"running-min={state['total_min']}\n"
        )


if __name__ == "__main__":
    main()
