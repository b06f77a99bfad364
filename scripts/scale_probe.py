"""Dual same-window probes for the alternating scaling protocol.

Measures 2-proc vs 8-proc scaling of two single-thread workloads on the
SAME pinned cores the engine pairs run on:

- cpu  : cache-resident fused multiply-add loop — core availability.
- mem  : large-buffer copies — DRAM bandwidth (what co-tenants saturate).

Emits one JSON calib line: {"kind": "calib", "cpu2": .., "cpu8": ..,
"mem2": .., "mem8": .., "cpu_ceiling": .., "mem_ceiling": .., "ts": ..}
where *_ceiling = thr(8 procs) / (4 * thr(2 procs)) — the hardware's own
N->4N efficiency for that resource in this window. An engine pair's raw
efficiency divided by the mem ceiling isolates engine scaling from
co-tenant bandwidth contention (see BENCH/BASELINE.md §3).

Usage: python scripts/scale_probe.py [pair_cpuset [duo_cpuset]]
       (defaults 8-15 and 8-9 — match the protocol's taskset pins)
"""

import json
import subprocess
import sys
import time

CPU_CODE = (
    "import numpy as np, time\n"
    "x = np.ones(65536)\n"
    "t0 = time.perf_counter()\n"
    "for _ in range(3000):\n"
    "    x = x * 1.0000001 + 1e-9\n"
    "print(time.perf_counter() - t0)\n"
)

MEM_CODE = (
    "import numpy as np, time\n"
    "a = np.zeros(25_000_000)\n"
    "t0 = time.perf_counter()\n"
    "for _ in range(6):\n"
    "    b = a.copy(); a[0] += b[0]\n"
    "print(time.perf_counter() - t0)\n"
)


def _burn(procs: int, cpuset: str, code: str) -> float:
    """Aggregate throughput (work-units/sec) of `procs` pinned processes."""
    ps = [
        subprocess.Popen(
            ["taskset", "-c", cpuset, sys.executable, "-c", code],
            stdout=subprocess.PIPE,
        )
        for _ in range(procs)
    ]
    ts = [float(p.communicate()[0]) for p in ps]
    return procs / (sum(ts) / len(ts))


def probe(pair_cpuset: str = "8-15", duo_cpuset: str = "8-9") -> dict:
    out = {"kind": "calib"}
    out["cpu2"] = round(_burn(2, duo_cpuset, CPU_CODE), 3)
    out["cpu8"] = round(_burn(8, pair_cpuset, CPU_CODE), 3)
    out["mem2"] = round(_burn(2, duo_cpuset, MEM_CODE), 3)
    out["mem8"] = round(_burn(8, pair_cpuset, MEM_CODE), 3)
    out["cpu_ceiling"] = round(out["cpu8"] / (4 * out["cpu2"]), 3)
    out["mem_ceiling"] = round(out["mem8"] / (4 * out["mem2"]), 3)
    out["ts"] = round(time.time(), 1)
    return out


if __name__ == "__main__":
    pair = sys.argv[1] if len(sys.argv) > 1 else "8-15"
    duo = sys.argv[2] if len(sys.argv) > 2 else "8-9"
    print(json.dumps(probe(pair, duo)))
