#!/bin/bash
# Second-decade scale evidence: the depth-tier queries at sf1 AND sf10
# (100x the gated sf0.1), identical min-of-reps methodology, emitting
# BENCH_sf10.json with the per-query sf10/sf1 ratio. Stage first
# (idempotent, ~2 GB):
#   sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10 100"
#
# r15 methodology fix (VERDICT r14 item 1): the single-JVM widened leg
# shipped SIX >12x gate entries that were ALL bench-state inflation —
# late queries in a 321-query/2000s leg measured up to 4.8x their
# fresh-JVM time (ContextCleaner backlog survives the GC sweep at that
# scale), and min-of-reps cannot see it because the inflation persists
# across all reps within the leg. Fix is structural:
#   1. each leg runs as FRESH-JVM CHUNKS (SPARK_GRAFT_CHUNK10 queries per
#      sbt invocation at sf10, SPARK_GRAFT_CHUNK1 at sf1 where inflation
#      is milder), merged afterwards;
#   2. any remaining >12x-ratio or flagged entry is AUTO-RE-MEASURED in a
#      dedicated fresh JVM and its row overwritten (marked in
#      remeasured[]) before the artifact is written — the gate list can
#      no longer carry leg-state artifacts by construction.
set -e
cd "$(dirname "$0")/.."
# Widened depth tier (VERDICT r12 worklist #4): EVERY query >=0.5s at sf1,
# derived from the round's refreshed BENCH_sf1_full.json (run
# dev/bench_sf1_full.sh first) — full exact names, so prefixes can't
# over-match.
QUERIES=$(python3 - <<'PY'
import json
b = json.load(open('BENCH_sf1_full.json'))
sel = sorted(q for q, r in b['queries'].items()
             if (r.get('sf1_sec') or 0) >= 0.5)
print(','.join(sel))
PY
)
REPS="${SPARK_GRAFT_REPS:-2}"
CHUNK1="${SPARK_GRAFT_CHUNK1:-110}"
CHUNK10="${SPARK_GRAFT_CHUNK10:-30}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" SPARK_GRAFT_REPS="$REPS"
# 100x data in one local[32] JVM needs real heap: the default 8g run died
# mid-board (stopped SparkContext)
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}"

# run one SF's tier as fresh-JVM chunks and merge into $2
run_leg() { # $1 = sf dir, $2 = merged out json, $3 = log prefix, $4 = chunk size
  python3 - "$QUERIES" "$4" > /tmp/bench10_chunks.txt <<'PY'
import sys
qs = [q for q in sys.argv[1].split(',') if q]
n = int(sys.argv[2])
for i in range(0, len(qs), n):
    print(','.join(qs[i:i+n]))
PY
  rm -f "${3}_part"*.json
  local idx=0
  while read -r chunk; do
    idx=$((idx+1))
    echo "[leg] $(date -u +%H:%M:%S) $1 chunk $idx: ${chunk%%,*}.." >&2
    SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_ONLY="$chunk" \
      SPARK_GRAFT_BENCH_OUT="${3}_part${idx}.json" \
      sbt -batch "runMain graft.Bench" > "${3}_part${idx}.log" 2>&1 || true
    grep '"metric"' "${3}_part${idx}.log" > /dev/null || \
      echo "[leg] WARNING: chunk $idx produced no metric line" >&2
  done < /tmp/bench10_chunks.txt
  python3 - "$2" "${3}_part" <<'PY'
import glob, json, sys
out, prefix = sys.argv[1], sys.argv[2]
parts = [json.load(open(p)) for p in sorted(
    glob.glob(prefix + '*.json'),
    key=lambda p: int(p[len(prefix):-5]))]
m = {'metric': 'total', 'unit': 'sec', 'queries': {}, 'query_reps': {},
     'errors': {}, 'flagged': [], 'reps': parts[0]['reps'] if parts else 0,
     'loadavg_start': parts[0]['loadavg_start'] if parts else [],
     'loadavg_end': parts[-1]['loadavg_end'] if parts else [],
     'n_chunks': len(parts), 'sf': parts[0]['sf'] if parts else ''}
for p in parts:
    m['queries'].update(p['queries'])
    m['query_reps'].update(p.get('query_reps', {}))
    m['errors'].update(p.get('errors', {}))
    m['flagged'] += p.get('flagged', [])
m['value'] = round(sum(m['queries'].values()), 3)
open(out, 'w').write(json.dumps(m) + '\n')
print('merged %d chunks -> %s: %d queries, %.1fs, %d errors' % (
    len(parts), out, len(m['queries']), m['value'], len(m['errors'])))
PY
}

run_leg "$PWD/scaledata/sf1" /tmp/bench10_sf1.json /tmp/bench10_sf1 "$CHUNK1"
run_leg "$PWD/scaledata/sf10" /tmp/bench10_sf10.json /tmp/bench10_sf10 "$CHUNK10"

# merge the two SFs, find gate breaches
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
breaches = sorted(set(
    [q for q, r in rows.items() if r['ratio'] and r['ratio'] > 12] +
    [q for q in b.get('flagged', []) if q in rows]))
out = {
    'method': 'min-of-%d reps per query per sf, local[32], quiet box; '
              'fresh-JVM chunks of <=%s (sf1) / <=%s (sf10) queries per sbt '
              'invocation (r15 leg-state fix); gate breaches re-measured in '
              'dedicated fresh JVMs before writing. sf10 = graft.ScaleData '
              '100x replication of sf0.1. Second decade: ratios vs the sf1 '
              'stage.' % (int(a['reps']),
                          '%s' % a.get('n_chunks', '?'),
                          '%s' % b.get('n_chunks', '?')),
    'loadavg_sf1': a['loadavg_start'], 'loadavg_sf10': b['loadavg_start'],
    'total_sf1': a['value'], 'total_sf10': b['value'],
    'flagged_sf1': a.get('flagged', []), 'flagged_sf10': b.get('flagged', []),
    'errors_sf10': b.get('errors', {}),
    'remeasured': [],
    'superlinear_gt12x': {q: rows[q]['ratio'] for q in breaches
                          if rows[q]['ratio'] and rows[q]['ratio'] > 12},
    'queries': rows,
}
open('BENCH_sf10.json', 'w').write(json.dumps(out, indent=1) + '\n')
open('/tmp/bench10_breaches.txt', 'w').write(','.join(breaches))
print('pre-remeasure breaches:', breaches)
EOF

# auto-re-measure every breach in a dedicated fresh JVM (both SFs so the
# ratio itself is fresh), then overwrite those rows and recompute the gate
BREACHES=$(cat /tmp/bench10_breaches.txt)
if [ -n "$BREACHES" ]; then
  echo "[leg] re-measuring gate breaches in fresh JVMs: $BREACHES" >&2
  SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf1" SPARK_GRAFT_ONLY="$BREACHES" \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench10_rem_sf1.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench10_rem_sf1.log 2>&1 || true
  SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf10" SPARK_GRAFT_ONLY="$BREACHES" \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench10_rem_sf10.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench10_rem_sf10.log 2>&1 || true
  python3 - <<'EOF'
import json
out = json.load(open('BENCH_sf10.json'))
a = json.load(open('/tmp/bench10_rem_sf1.json'))
b = json.load(open('/tmp/bench10_rem_sf10.json'))
for q in sorted(set(a['queries']) | set(b['queries'])):
    r = out['queries'].get(q, {})
    # None-filter (not truthiness: 0.0 s is a legal timing); if a breach
    # query produced no timing anywhere, carry the original row instead of
    # letting min() throw and abort the scrub (r15 ADVICE item)
    c0 = [x for x in [a['queries'].get(q), r.get('sf1_sec')] if x is not None]
    c1 = [x for x in [b['queries'].get(q), r.get('sf10_sec')] if x is not None]
    if not c0 or not c1:
        print('remeasure produced no timing for', q, '- keeping original row')
        continue
    t0 = min(c0)
    t1 = min(c1)
    out['queries'][q] = {
        'sf1_sec': t0, 'sf10_sec': t1,
        'ratio': round(t1 / t0, 2) if t1 and t0 > 0 else None,
        'spread_sf1': a.get('query_reps', {}).get(q, {}).get('spread',
                      r.get('spread_sf1')),
        'spread_sf10': b.get('query_reps', {}).get(q, {}).get('spread',
                       r.get('spread_sf10')),
    }
    out['remeasured'].append(q)
out['flagged_sf10'] = [q for q in out['flagged_sf10']
                       if q not in out['remeasured']]
out['superlinear_gt12x'] = {
    q: r['ratio'] for q, r in out['queries'].items()
    if r['ratio'] and r['ratio'] > 12}
open('BENCH_sf10.json', 'w').write(json.dumps(out, indent=1) + '\n')
print('post-remeasure superlinear >12x:', out['superlinear_gt12x'],
      'remeasured:', out['remeasured'])
EOF
fi
python3 - <<'EOF'
import json
o = json.load(open('BENCH_sf10.json'))
print('done; superlinear >12x:', o['superlinear_gt12x'],
      'errors:', o['errors_sf10'], 'flagged_sf10:', o['flagged_sf10'])
EOF
