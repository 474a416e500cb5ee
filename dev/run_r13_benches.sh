#!/bin/bash
# Round-13 official bench chain — sequential because sbt is a global lock.
# Order matters: bench_sf1_full.sh refreshes BENCH_sf1_full.json, from which
# bench_sf10.sh derives its widened (>=0.5s at sf1) depth tier.
set -e
cd "$(dirname "$0")/.."
echo "=== leg 1: bench_sf1_full ($(date)) ==="
bash dev/bench_sf1_full.sh
echo "=== leg 2: bench_sf10 widened ($(date)) ==="
bash dev/bench_sf10.sh
echo "=== leg 3: bench_skew ($(date)) ==="
bash dev/bench_skew.sh
echo "=== leg 4: bench_skew10 ($(date)) ==="
bash dev/bench_skew10.sh
echo "=== done ($(date)) ==="
