#!/bin/bash
# Round-18 official bench chain — sequential because sbt is a global lock.
# Order matters: bench_sf1_full.sh refreshes BENCH_sf1_full.json, from which
# bench_sf10.sh derives its widened (>=0.5s at sf1) depth tier.
#
# r18 deltas vs run_r17_benches.sh:
#  - leg 0b: OFFICIAL sf0.1 board re-baseline on a quiet box (r17 verdict
#    item 3: the +15.4% drift read as launch load; this leg waits for
#    loadavg quiet and records it) -> bench_out.json, the BENCH_r18 input.
#  - leg 6: q351 PLAN CENSUS at sf1 AND sf10 (r17 verdict item 1's "Done"
#    bar: the ~12 MB customer key frame must broadcast at BOTH decades
#    under the byte bound) -> PLANS_q351.json, read from the query's own
#    n_broadcast_in_plan + decision columns at each SF.
#  - leg 5 (profile) re-run: the LPA label-broadcast jobs must read
#    smaller under the primitive-array tier (r17 verdict item 4).
set -e
cd "$(dirname "$0")/.."
echo "=== leg 0: stage scale corpora ($(date)) ==="
[ -d scaledata/sf1 ]      || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf1 10"
[ -d scaledata/sf10 ]     || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10 100"
[ -d scaledata/sf1zipf ]  || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf1zipf 10 zipf"
[ -d scaledata/sf10zipf ] || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10zipf 100 zipf"
echo "=== leg 0b: official sf0.1 board, quiet-box re-baseline ($(date)) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_QUIET_WAIT=300 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r18_official.log 2>&1 || true
grep '"metric"' /tmp/bench_r18_official.log > /dev/null || \
  echo "[leg 0b] WARNING: no metric line" >&2
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
import json
def grab(p):
    for line in open(p):
        line = line.strip()
        if line.startswith('{"query"'):
            return json.loads(line)
    return None
a, b = grab('/tmp/prof335_sf1.log'), grab('/tmp/prof335_sf10.log')
out = {'method': 'graft.ProfileQuery: per-Spark-job wall clock with call '
       'sites, fresh JVM per sf, local[32], untimed parquet/codegen warmup, '
       'listener bus drained (not slept) before emit. r18: the LPA rounds '
       'run the primitive-array label tier — the r17 label-broadcast '
       'hash-relation jobs should be gone or shrunk.',
       'sf1': a, 'sf10': b}
if a and b:
    out['total_ratio'] = round(b['total_sec'] / a['total_sec'], 2)
open('PROFILE_q335.json', 'w').write(json.dumps(out, indent=1) + '\n')
print('profile written; totals sf1=%s sf10=%s' % (
    a and a['total_sec'], b and b['total_sec']))
PY
echo "=== leg 6: q351 plan census at both decades ($(date)) ==="
rm -rf /tmp/q351_sf1 /tmp/q351_sf10
SPARK_GRAFT_ONLY="q351_" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Verify $PWD/scaledata/sf1 /tmp/q351_sf1" \
  > /tmp/q351_sf1.log 2>&1 || true
SPARK_GRAFT_ONLY="q351_" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Verify $PWD/scaledata/sf10 /tmp/q351_sf10" \
  > /tmp/q351_sf10.log 2>&1 || true
python3 - <<'PY'
import json, glob
import duckdb
con = duckdb.connect()
out = {'method': "q351's own output at each SF (graft.Verify, fresh JVM): "
       'the rule-planned decisions, est/upper build bytes and the '
       'BroadcastHashJoin census over the plan it actually produced — '
       'the r17 item-1 Done bar: the customer key frame broadcasts at '
       'BOTH decades under the byte bound.'}
for sf in ('sf1', 'sf10'):
    files = glob.glob(f'/tmp/q351_{sf}/q351_deep_rule_planned_join/*.parquet')
    if not files:
        out[sf] = None
        continue
    rows = con.sql(
        f"SELECT stage, join_edge, build_side, est_build_rows, "
        f"est_build_bytes, decision, n_broadcast_in_plan "
        f"FROM '/tmp/q351_{sf}/q351_deep_rule_planned_join/*.parquet' "
        f"ORDER BY stage").fetchall()
    out[sf] = [dict(zip(['stage', 'join_edge', 'build_side',
                         'est_build_rows', 'est_build_bytes', 'decision',
                         'n_broadcast_in_plan'], r)) for r in rows]
open('PLANS_q351.json', 'w').write(json.dumps(out, indent=1, default=str) + '\n')
print('q351 census written')
PY
echo "=== done ($(date)) ==="
