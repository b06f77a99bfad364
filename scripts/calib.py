"""Same-window environment calibration probes.

The sandbox host is multi-tenant: usable DRAM bandwidth swings several-fold
between minutes while cores stay stable. Any wall-clock comparison across
bench runs (round-over-round regressions, A/B pairs) is unattributable
without a same-window measurement of BOTH ceilings, so bench.py embeds
these two single-threaded probes before and after the suite:

- memcpy_gbps : large-buffer copy (read+write counted) — DRAM bandwidth,
  the resource co-tenants actually contend on.
- cpu_mflops  : cache-resident fused multiply-add loop (512 KB working
  set, L2-resident) — core speed, expected stable across windows.

A suite-wall regression with flat probes is the engine; a regression with
a collapsed memcpy probe is the box.
"""

from __future__ import annotations

import time

import numpy as np


def memcpy_gbps(size_mb: int = 256, reps: int = 3) -> float:
    a = np.ones(size_mb * 1024 * 1024 // 8, dtype=np.float64)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        b = a.copy()
        dt = time.perf_counter() - t0
        best = max(best, 2 * a.nbytes / dt / 1e9)
        del b
    return round(best, 2)


def cpu_mflops(reps: int = 3, iters: int = 2000) -> float:
    x = np.ones(65536, dtype=np.float64)  # 512 KB: stays in cache
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = y * 1.0000001 + 1e-9
        dt = time.perf_counter() - t0
        best = max(best, x.size * iters * 2 / dt / 1e6)
    return round(best, 1)


def probe() -> dict:
    return {"memcpy_gbps": memcpy_gbps(), "cpu_mflops": cpu_mflops()}


if __name__ == "__main__":
    import json

    print(json.dumps(probe()))
