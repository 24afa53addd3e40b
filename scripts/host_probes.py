"""Host-resource probes: WHAT bounds N-vs-4N efficiency on this sandbox.

The sandbox is a single Firecracker VM (32 vCPUs, one NUMA node, no
cpufreq interface). The scaling benchmark runs both "clusters" on this
one box, so any resource the box shares across cores — not the engine's
dataflow — shows up as lost efficiency at the bigger cluster size. Two
micro-probes separate the candidate ceilings, with zero Spark, zero JVM,
zero shuffle in the loop:

1. ALU probe — P taskset-pinned busy-loop processes (pure register/cache
   arithmetic). If per-core rate at P=16 equals P=4 and /proc/stat steal
   stays ~0, compute itself scales cleanly: no hypervisor descheduling,
   no turbo/frequency penalty for waking more vCPUs.
2. Memory-stream probe — P pinned processes each streaming a 256 MB
   buffer through memcpy (numpy .copy(), ~512 MB moved per iteration).
   Per-core rate at 16 vs 4 measures how the MEMORY BUS divides: on this
   VM the aggregate bandwidth available to 4 cores is already the whole
   box, so 16 streaming cores split the same total (per-core ratio ~1/4).

Interpretation for the scaling gate: an index build moves corpus-sized
bytes (tokenize → shuffle write/read → sort → encode → parquet), so some
fraction of its work sits on the memory bus. On ONE box that bus is a
fixed resource and the 4N "cluster" cannot have more of it — whereas on a
real 4N-executor cluster every executor brings its own memory channels
(the resource the north rule's wording assumes grows with the cluster).
The probes quantify the box's wall; the build's raw ratio should be read
against it (see BENCH/BASELINE.md).

Usage: python scripts/host_probes.py [seconds_per_run]
Writes BENCH/host_probes.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_ALU = (
    "import time,sys\n"
    "end=time.time()+float(sys.argv[1]); n=0\n"
    "while time.time()<end:\n"
    "    for _ in range(100000): n+=1\n"
    "print(n//100000)\n"
)

_MEM = (
    "import numpy as np, time, sys\n"
    "buf = np.empty(32 * 1024 * 1024, dtype=np.int64)\n"
    "buf[:] = np.arange(buf.size)\n"
    "end = time.time() + float(sys.argv[1]); n = 0\n"
    "while time.time() < end:\n"
    "    b = buf.copy()\n"          # ~512 MB through the bus per iter
    "    n += int(b[-1] & 1) + 1\n"
    "print(n)\n"
)


def _read_stat() -> dict:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    keys = ["user", "nice", "system", "idle", "iowait", "irq", "softirq",
            "steal"]
    return dict(zip(keys, (int(x) for x in parts[1:9])))


def _run_level(code: str, p: int, secs: float) -> dict:
    before = _read_stat()
    t0 = time.time()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", code, str(secs)],
            stdout=subprocess.PIPE, text=True,
        )
        for i in range(p)
    ]
    units = sum(
        int(pr.communicate()[0].strip().splitlines()[-1]) for pr in procs
    )
    wall = time.time() - t0
    d = {k: v - before[k] for k, v in _read_stat().items()}
    hz = os.sysconf("SC_CLK_TCK")
    return {
        "procs": p,
        "units_per_core_sec": round(units / (p * wall), 2),
        "steal_frac_per_busy_core": round(d["steal"] / hz / (p * wall), 4),
    }


def _probe(code: str, secs: float) -> dict:
    # alternated best-of-2 per level, like the scaling harness: host
    # interference only slows a run, so best-of rejects it
    runs = [_run_level(code, p, secs) for p in (4, 16, 4, 16)]
    best = {}
    for r in runs:
        cur = best.get(r["procs"])
        if cur is None or r["units_per_core_sec"] > cur["units_per_core_sec"]:
            best[r["procs"]] = r
    return {
        "runs": runs,
        "per_core_ratio_16_vs_4": round(
            best[16]["units_per_core_sec"] / best[4]["units_per_core_sec"], 3
        ),
        "max_steal_frac": max(r["steal_frac_per_busy_core"] for r in runs),
    }


def _merge(prev: dict | None, cur: dict) -> dict:
    """Accumulate runs across probe invocations; interference can only
    SLOW a probe, so the best rate per level over ALL observations is the
    right estimator of the box's capability."""
    if prev:
        cur = {"runs": prev["runs"] + cur["runs"]}
    best = {}
    for r in cur["runs"]:
        b = best.get(r["procs"])
        if b is None or r["units_per_core_sec"] > b:
            best[r["procs"]] = r["units_per_core_sec"]
    cur["per_core_ratio_16_vs_4"] = round(best[16] / best[4], 3)
    cur["max_steal_frac"] = max(
        r["steal_frac_per_busy_core"] for r in cur["runs"]
    )
    return cur


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH", "host_probes.json")
    prev = None
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    out = {
        "alu": _merge(prev and prev.get("alu"), _probe(_ALU, secs)),
        "memstream": _merge(
            prev and prev.get("memstream"), _probe(_MEM, secs)
        ),
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
