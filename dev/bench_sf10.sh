#!/bin/bash
# Second-decade scale evidence (VERDICT r10 worklist #6): the depth-tier
# queries at sf1 AND sf10 (100x the gated sf0.1), identical min-of-reps
# methodology, emitting BENCH_sf10.json with the per-query sf10/sf1 ratio.
# 10x->100x is where fixed overhead stops masking super-linear terms: a
# plan whose sf1/sf0.1 ratio hid behind JVM/scan floors shows its true
# complexity on this decade. Stage first (idempotent, ~2 GB):
#   sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10 100"
set -e
cd "$(dirname "$0")/.."
# Widened depth tier (VERDICT r12 worklist #4): EVERY query >=0.5s at sf1,
# derived from the round's refreshed BENCH_sf1_full.json (run
# dev/bench_sf1_full.sh first) — full exact names, so prefixes can't
# over-match. The old hand-picked 32-query list missed the streaming
# family, q214, q232, q142 and the TPC-H heavies.
QUERIES=$(python3 - <<'PY'
import json
b = json.load(open('BENCH_sf1_full.json'))
sel = sorted(q for q, r in b['queries'].items()
             if (r.get('sf1_sec') or 0) >= 0.5)
print(','.join(sel))
PY
)
REPS="${SPARK_GRAFT_REPS:-2}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS="$REPS"
# 100x data in one local[32] JVM needs real heap: the default 8g run died
# mid-board (stopped SparkContext); full logs kept for the autopsy either way
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}"

SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf1" SPARK_GRAFT_BENCH_OUT=/tmp/bench10_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench10_sf1.log 2>&1 || true
grep '"metric"' /tmp/bench10_sf1.log || true
SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf10" SPARK_GRAFT_BENCH_OUT=/tmp/bench10_sf10.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench10_sf10.log 2>&1 || true
grep '"metric"' /tmp/bench10_sf10.log || true

python3 - <<'EOF'
import json
a = json.load(open('/tmp/bench10_sf1.json'))
b = json.load(open('/tmp/bench10_sf10.json'))
rows = {}
for q in sorted(a['queries']):
    t0, t1 = a['queries'][q], b['queries'].get(q)
    rows[q] = {
        'sf1_sec': t0, 'sf10_sec': t1,
        'ratio': round(t1 / t0, 2) if t1 and t0 > 0 else None,
        'spread_sf1': a.get('query_reps', {}).get(q, {}).get('spread'),
        'spread_sf10': b.get('query_reps', {}).get(q, {}).get('spread'),
    }
sup = {q: r['ratio'] for q, r in rows.items() if r['ratio'] and r['ratio'] > 12}
out = {
    'method': 'min-of-%d reps per query per sf, local[32], quiet box; sf10 = graft.ScaleData 100x replication of sf0.1 (keys offset per replica, docs bijectively ciphered, dims fixed). Second decade: ratios vs the sf1 stage.' % int(a['reps']),
    'loadavg_sf1': a['loadavg_start'], 'loadavg_sf10': b['loadavg_start'],
    'total_sf1': a['value'], 'total_sf10': b['value'],
    'flagged_sf1': a.get('flagged', []), 'flagged_sf10': b.get('flagged', []),
    'errors_sf10': b.get('errors', {}),
    'superlinear_gt12x': sup,
    'queries': rows,
}
open('BENCH_sf10.json', 'w').write(json.dumps(out, indent=1) + '\n')
print('done; superlinear >12x:', sup, 'errors:', out['errors_sf10'])
EOF
