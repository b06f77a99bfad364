"""Interleaved cold-build A/B across code trees (VERDICT r4 'Next round' #1b).

The r4 bench showed index_build 14.6s (r3) -> 21.1s (r4) at EQUAL memcpy
bandwidth while every other phase and the warmed plan A/Bs stayed flat —
an unattributed cold-first-build drift. This harness splits engine from
environment: alternating fresh-process builds of each tree inside one
window, with a memcpy probe before every build, so a tree-correlated
delta is the engine and a window-correlated one is the box.

Usage: python ab_cold_build_r5.py [--pairs 4] [--sf DIR] [--cpus 32] \
           [--trees label=path ...]
Writes one JSON line per build to BENCH/ab_cold_build_r5.jsonl.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument(
        "--trees",
        nargs="+",
        default=[f"r3=/tmp/r3tree", f"r5={REPO}"],
        metavar="label=path",
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/ab_cold_build_r5.jsonl"))
    args = ap.parse_args()

    trees = [t.split("=", 1) for t in args.trees]
    runner = os.path.join(REPO, "scripts/cold_build_once.py")
    with open(args.out, "a") as f:
        for i in range(args.pairs):
            for label, path in trees:
                cmd = [sys.executable, runner, path, args.sf, args.cpus, label]
                r = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=1200
                )
                line = (r.stdout.strip().splitlines() or ["{}"])[-1]
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    row = {"label": label, "error": r.stderr[-500:]}
                row["pair"] = i
                f.write(json.dumps(row) + "\n")
                f.flush()
                print(
                    f"[pair {i}] {label}: wall={row.get('wall_s')}s "
                    f"jvm={row.get('jvm_startup_s')}s "
                    f"probe={row.get('probe_pre', {}).get('memcpy_gbps')} GB/s "
                    f"stages={row.get('stage_wall_s')}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
