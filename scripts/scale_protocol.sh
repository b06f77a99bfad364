#!/bin/bash
# Alternating pinned scaling protocol (north-rule N vs 4N evidence).
#
# Runs PAIRS of identical jobs at local[8] (pinned to 8 cores) and local[2]
# (pinned to 2 of the same cores) over byte-identical input, with a dual
# cpu+mem probe (scripts/scale_probe.py) immediately before each pair so
# every pair carries its own window's hardware ceilings. Single A/Bs are
# lottery tickets on this multi-tenant box — report the per-pair table and
# medians via scripts/report_scaling.py.
#
# Usage:
#   python scripts/scaling_bench.py --gen --n-docs 400000 --corpus /tmp/c400k.parquet
#   bash scripts/scale_protocol.sh /tmp/c400k.parquet /tmp/scale_r3.jsonl [pairs]
set -u
cd "$(dirname "$0")/.."
CORPUS=${1:-/tmp/c400k.parquet}
OUT=${2:-/tmp/scale_r3.jsonl}
PAIRS=${3:-6}
: > "$OUT"
export SCALE_QUERIES=600
for i in $(seq 1 "$PAIRS"); do
  python scripts/scale_probe.py >> "$OUT"
  rm -rf /tmp/scale_idx_z
  taskset -c 8-15 python scripts/scaling_bench.py --cpus 8 --corpus "$CORPUS" \
      --index-dir /tmp/scale_idx_z >> "$OUT" 2>/dev/null
  rm -rf /tmp/scale_idx_z
  taskset -c 8-9 python scripts/scaling_bench.py --cpus 2 --corpus "$CORPUS" \
      --index-dir /tmp/scale_idx_z >> "$OUT" 2>/dev/null
done
python scripts/scale_probe.py >> "$OUT"
echo DONE
