#!/bin/bash
# Scale-evidence bench (VERDICT r9 worklist #5): run the 15 most
# scale-sensitive queries at sf0.1 and at the repo-staged sf1 (10x rows,
# graft.ScaleData) with IDENTICAL methodology (min-of-REPS on a quiet box),
# then emit BENCH_sf1.json with the per-query sf1/sf0.1 ratio. A
# scale-shaped plan should land near ratio 10 (linear); sub-linear means
# fixed overhead still dominates at sf1; super-linear needs an explanation
# or a fix.
set -e
cd "$(dirname "$0")/.."
QUERIES="q40,q83,q73,q112,q113,q127,q130,q174,q189,q214,q261,q53,q98,q158,q175,q44,q210,q301,q302,q31,q09,q308,q310,q311,q316,q318,q326,q335,q142,q232,q339,q340,q341"
REPS="${SPARK_GRAFT_REPS:-2}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS="$REPS"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf01.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true
SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf1" SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true

python3 - <<'EOF'
import json
a = json.load(open('/tmp/bench_sf01.json'))
b = json.load(open('/tmp/bench_sf1.json'))
rows = {}
for q in sorted(a['queries']):
    t0, t1 = a['queries'][q], b['queries'].get(q)
    rows[q] = {
        'sf0.1_sec': t0, 'sf1_sec': t1,
        'ratio': round(t1 / t0, 2) if t1 and t0 > 0 else None,
        'spread_sf0.1': a.get('query_reps', {}).get(q, {}).get('spread'),
        'spread_sf1': b.get('query_reps', {}).get(q, {}).get('spread'),
    }
out = {
    'method': 'min-of-%d reps per query per sf, local[32], quiet box; sf1 = graft.ScaleData 10x replication of sf0.1 (keys offset per replica, docs bijectively ciphered, dims fixed)' % int(a['reps']),
    'loadavg_sf0.1': a['loadavg_start'], 'loadavg_sf1': b['loadavg_start'],
    'total_sf0.1': a['value'], 'total_sf1': b['value'],
    'flagged_sf0.1': a.get('flagged', []), 'flagged_sf1': b.get('flagged', []),
    'errors_sf1': b.get('errors', {}),
    'queries': rows,
}
open('BENCH_sf1.json', 'w').write(json.dumps(out, indent=1) + '\n')
print(json.dumps({q: r['ratio'] for q, r in rows.items()}))
EOF
