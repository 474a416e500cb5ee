#!/bin/bash
# Round-15 official bench chain — sequential because sbt is a global lock.
# Order matters: bench_sf1_full.sh refreshes BENCH_sf1_full.json, from which
# bench_sf10.sh derives its widened (>=0.5s at sf1) depth tier.
#
# r15 deltas vs run_r14_benches.sh:
#  - bench_sf10.sh now runs each SF as FRESH-JVM CHUNKS and auto-re-measures
#    every >12x / flagged entry in a dedicated fresh JVM before writing the
#    artifact (VERDICT r14 item 1: the single-JVM leg shipped six false gate
#    entries from leg-state inflation)
set -e
cd "$(dirname "$0")/.."
echo "=== leg 1: bench_sf1_full ($(date)) ==="
bash dev/bench_sf1_full.sh
echo "=== leg 2: bench_sf10 widened, chunked fresh JVMs, reps=3 ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_sf10.sh
echo "=== leg 3: bench_skew ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew.sh
echo "=== leg 4: bench_skew10 ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew10.sh
echo "=== done ($(date)) ==="
