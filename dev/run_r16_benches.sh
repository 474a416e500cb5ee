#!/bin/bash
# Round-16 official bench chain — sequential because sbt is a global lock.
# Order matters: bench_sf1_full.sh refreshes BENCH_sf1_full.json, from which
# bench_sf10.sh derives its widened (>=0.5s at sf1) depth tier.
#
# r16 deltas vs run_r15_benches.sh:
#  - stages all four scale corpora up front (idempotent; the zipf twins are
#    needed by both skew legs)
#  - the session now applies corpus-scaled AQE widths at sf1+ (see
#    graft.util.Sizing.configureAdaptiveWidths) — sf0.1 numbers are
#    untouched by construction
set -e
cd "$(dirname "$0")/.."
echo "=== leg 0: stage scale corpora ($(date)) ==="
[ -d scaledata/sf1 ]      || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf1 10"
[ -d scaledata/sf10 ]     || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10 100"
[ -d scaledata/sf1zipf ]  || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf1zipf 10 zipf"
[ -d scaledata/sf10zipf ] || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10zipf 100 zipf"
echo "=== leg 1: bench_sf1_full ($(date)) ==="
bash dev/bench_sf1_full.sh
echo "=== leg 2: bench_sf10 widened, chunked fresh JVMs, reps=2 ($(date)) ==="
SPARK_GRAFT_REPS=2 bash dev/bench_sf10.sh
echo "=== leg 3: bench_skew ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew.sh
echo "=== leg 4: bench_skew10 ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew10.sh
echo "=== done ($(date)) ==="
