#!/bin/bash
# Round-17 official bench chain — sequential because sbt is a global lock.
# Order matters: bench_sf1_full.sh refreshes BENCH_sf1_full.json, from which
# bench_sf10.sh derives its widened (>=0.5s at sf1) depth tier.
#
# r17 deltas vs run_r16_benches.sh:
#  - leg 5: per-stage PROFILE of q335 at sf1 AND sf10 (graft.ProfileQuery,
#    fresh JVM each) -> PROFILE_q335.json — the r16 verdict's item-2
#    evidence: settle the <=8x/decade bar with a per-job profile instead
#    of prose (each job's sf10/sf1 ratio shows which stages are
#    data-proportional and which are fixed overhead).
#  - the r16 failure mode (claims shipped without the legs) is the reason
#    this chain runs AS ONE SCRIPT on frozen HEAD: all artifacts or none.
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
echo "=== leg 5: q335 per-stage profile, fresh JVM per sf ($(date)) ==="
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf1" \
  sbt -batch "runMain graft.ProfileQuery" > /tmp/prof335_sf1.log 2>&1 || true
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf10" \
  sbt -batch "runMain graft.ProfileQuery" > /tmp/prof335_sf10.log 2>&1 || true
python3 - <<'PY'
import json, re
def grab(p):
    for line in open(p):
        line = line.strip()
        if line.startswith('{"query"'):
            return json.loads(line)
    return None
a, b = grab('/tmp/prof335_sf1.log'), grab('/tmp/prof335_sf10.log')
out = {'method': 'graft.ProfileQuery: per-Spark-job wall clock with call '
       'sites, fresh JVM per sf, local[32], untimed parquet/codegen warmup. '
       'sf10/sf1 job-level ratios separate data-proportional stages from '
       'fixed overhead (r16 verdict item 2).',
       'sf1': a, 'sf10': b}
if a and b:
    out['total_ratio'] = round(b['total_sec'] / a['total_sec'], 2)
open('PROFILE_q335.json', 'w').write(json.dumps(out, indent=1) + '\n')
print('profile written; totals sf1=%s sf10=%s' % (
    a and a['total_sec'], b and b['total_sec']))
PY
echo "=== done ($(date)) ==="
