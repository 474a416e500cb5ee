#!/bin/bash
# Round-14 official bench chain — sequential because sbt is a global lock.
# Order matters: bench_sf1_full.sh refreshes BENCH_sf1_full.json, from which
# bench_sf10.sh derives its widened (>=0.5s at sf1) depth tier.
#
# r14 deltas vs run_r13_benches.sh:
#  - the depth/skew legs run at reps=3 (VERDICT r13 items 1 & 4: the sf10
#    min-of-2 spreads — q335 85s on a 180s median — could not support a
#    verdict; one more rep per query buys trustworthy minima now that the
#    GC sweep runs from rep 1)
#  - scaledata/sf10zipf re-staged on the factor-scaled 160/80-file layout
#    (VERDICT item 3), so BENCH_skew10's stages are finally layout-comparable
set -e
cd "$(dirname "$0")/.."
echo "=== leg 1: bench_sf1_full ($(date)) ==="
bash dev/bench_sf1_full.sh
echo "=== leg 2: bench_sf10 widened, reps=3 ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_sf10.sh
echo "=== leg 3: bench_skew ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew.sh
echo "=== leg 4: bench_skew10 ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew10.sh
echo "=== done ($(date)) ==="
