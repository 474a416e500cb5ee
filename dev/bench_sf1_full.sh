#!/bin/bash
# Full-board scale evidence: EVERY registered query at sf0.1 and at the
# staged sf1 (10x rows, graft.ScaleData), identical methodology (reps=1 —
# breadth over depth; the 15-query BENCH_sf1.json carries the min-of-reps
# depth tier), emitting BENCH_sf1_full.json with per-query ratios. Expect
# zero errors: the first run of this board at sf1 caught q226/q285, and a
# clean board is the regression gate for "would it survive 10x".
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" SPARK_GRAFT_REPS=1
unset SPARK_GRAFT_ONLY

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/full_sf01.json \
  sbt -batch "runMain graft.Bench" > /tmp/full_sf01.log 2>&1 || true
SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf1" SPARK_GRAFT_BENCH_OUT=/tmp/full_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/full_sf1.log 2>&1 || true

python3 - <<'EOF'
import json
a = json.load(open('/tmp/full_sf01.json'))
b = json.load(open('/tmp/full_sf1.json'))
rows = {}
for q in sorted(a['queries']):
    t0, t1 = a['queries'][q], b['queries'].get(q)
    rows[q] = {'sf0.1_sec': t0, 'sf1_sec': t1,
               'ratio': round(t1 / t0, 2) if t1 and t0 > 0 else None}
sup = {q: r['ratio'] for q, r in rows.items() if r['ratio'] and r['ratio'] > 12}
out = {
 'method': 'all registered queries, reps=1, local[32], sf1 = graft.ScaleData 10x replication of sf0.1 (FK-consistent key offsets, fixed dims, per-replica bijective text cipher). Single-rep timings: read RATIOS, not absolute values; the 15-query BENCH_sf1.json is the min-of-reps depth tier.',
 'total_sf0.1': a['value'], 'total_sf1': b['value'],
 'errors_sf0.1': a.get('errors', {}), 'errors_sf1': b.get('errors', {}),
 'loadavg_sf0.1': a['loadavg_start'], 'loadavg_sf1': b['loadavg_start'],
 'superlinear_gt12x': sup,
 'queries': rows,
}
open('BENCH_sf1_full.json', 'w').write(json.dumps(out, indent=1) + '\n')
print('done; superlinear >12x:', sup, 'errors:', out['errors_sf1'])
EOF
