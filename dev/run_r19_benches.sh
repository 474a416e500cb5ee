#!/bin/bash
# Round-19 official bench chain — sequential because sbt is a global lock.
# Order matters: bench_sf1_full.sh refreshes BENCH_sf1_full.json, from which
# bench_sf10.sh derives its widened (>=0.5s at sf1) depth tier.
#
# r19 deltas vs run_r18_benches.sh (the r18 verdict's worklist, items 2-5):
#  - leg 2 runs with a REAL quiet gate (QUIET_BAR=4, WAIT=240 per chunk):
#    r18's sf10 leg recorded loadavg 7.8-10.1 while its method string said
#    "quiet box", and half the round's ambiguity was measurement.
#  - leg 5 profiles q96 as well as q335 (item 2: adjudicate the streaming
#    regression with stage names) -> PROFILE_q335.json, PROFILE_q96.json.
#  - leg 7 (NEW): DEDICATED fresh-JVM min-of-2 probes for the three
#    ambiguous heavies (q96 83.0s/10.72x unexplained, q335 vs the <=75s
#    bar, q208's 36% drift) at BOTH decades, one sbt invocation per
#    (query, sf) -> PROBES_r19.json (items 2-4).
#  - leg 8 (NEW): RENDER the SURVEY §8.1 measured summary FROM the
#    committed JSONs between the R19-SUMMARY markers (item 1: a prose
#    number that matches no artifact becomes impossible).
set -e
cd "$(dirname "$0")/.."
echo "=== leg 0: stage scale corpora ($(date)) ==="
[ -d scaledata/sf1 ]      || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf1 10"
[ -d scaledata/sf10 ]     || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10 100"
[ -d scaledata/sf1zipf ]  || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf1zipf 10 zipf"
[ -d scaledata/sf10zipf ] || sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 scaledata/sf10zipf 100 zipf"
echo "=== leg 0b: official sf0.1 board, quiet box ($(date)) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_QUIET_WAIT=300 SPARK_GRAFT_QUIET_BAR=4 \
  SPARK_GRAFT_BENCH_OUT=BENCH_r19_official.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r19_official.log 2>&1 || true
grep '"metric"' /tmp/bench_r19_official.log > /dev/null || \
  echo "[leg 0b] WARNING: no metric line" >&2
echo "=== leg 1: bench_sf1_full ($(date)) ==="
bash dev/bench_sf1_full.sh
echo "=== leg 2: bench_sf10 widened, chunked fresh JVMs, reps=2, quiet-gated ($(date)) ==="
SPARK_GRAFT_REPS=2 SPARK_GRAFT_QUIET_BAR=4 SPARK_GRAFT_QUIET_WAIT=240 \
  bash dev/bench_sf10.sh
echo "=== leg 3: bench_skew ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew.sh
echo "=== leg 4: bench_skew10 ($(date)) ==="
SPARK_GRAFT_REPS=3 bash dev/bench_skew10.sh
echo "=== leg 5: q335 + q96 per-stage profiles, fresh JVM per (query, sf) ($(date)) ==="
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
for q in q335_projected_community_quality q96_stream_session_append; do
  for sf in sf1 sf10; do
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR="$PWD/scaledata/$sf" \
      SPARK_GRAFT_PROFILE_QUERY="$q" \
      sbt -batch "runMain graft.ProfileQuery" > "/tmp/prof_${q%%_*}_${sf}.log" 2>&1 || true
  done
done
python3 - <<'PY'
import json
def grab(p):
    try:
        for line in open(p):
            line = line.strip()
            if line.startswith('{"query"'):
                return json.loads(line)
    except FileNotFoundError:
        pass
    return None
for q, out in (('q335', 'PROFILE_q335.json'), ('q96', 'PROFILE_q96.json')):
    a, b = grab(f'/tmp/prof_{q}_sf1.log'), grab(f'/tmp/prof_{q}_sf10.log')
    o = {'method': 'graft.ProfileQuery: per-Spark-job wall clock with call '
         'sites, fresh JVM per (query, sf), local[32], untimed warmup run, '
         'listener bus drained (not slept) before emit.',
         'sf1': a, 'sf10': b}
    if a and b and a.get('total_sec'):
        o['total_ratio'] = round(b['total_sec'] / a['total_sec'], 2)
    open(out, 'w').write(json.dumps(o, indent=1) + '\n')
    print(f'{out}: totals sf1={a and a.get("total_sec")} '
          f'sf10={b and b.get("total_sec")}')
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
       'the r17 item-1 Done bar held on r19 HEAD: the customer key frame '
       'broadcasts at BOTH decades under the byte bound.'}
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
echo "=== leg 7: dedicated fresh-JVM probes, min-of-2, both decades ($(date)) ==="
for q in q96_stream_session_append q335_projected_community_quality q208_triangle_count; do
  for sf in sf1 sf10; do
    echo "[leg 7] $(date -u +%H:%M:%S) probe $q @ $sf" >&2
    SPARK_GRAFT_SF_DIR="$PWD/scaledata/$sf" SPARK_GRAFT_ONLY="$q" \
      SPARK_GRAFT_REPS=2 SPARK_GRAFT_QUIET_BAR=4 SPARK_GRAFT_QUIET_WAIT=240 \
      SPARK_DRIVER_MEM=64g \
      SPARK_GRAFT_BENCH_OUT="/tmp/probe_${q%%_*}_${sf}.json" \
      sbt -batch "runMain graft.Bench" > "/tmp/probe_${q%%_*}_${sf}.log" 2>&1 || true
  done
done
python3 - <<'PY'
import json
out = {'method': 'dedicated fresh JVM per (query, sf): one sbt invocation '
       'benches ONE query at ONE scale factor, min-of-2 reps (+1 for '
       'streaming), quiet-gated (bar 4, wait 240s), local[32], 64g. The '
       'r18 verdict items 2-4: q96 (83.0s/10.72x unexplained), q335 (vs '
       'the <=75s re-based bar), q208 (69.5 -> 94.4s drift) measured '
       'free of chunked-leg state.'}
for q in ('q96', 'q335', 'q208'):
    row = {}
    for sf in ('sf1', 'sf10'):
        try:
            j = json.load(open(f'/tmp/probe_{q}_{sf}.json'))
            name, t = next(iter(j['queries'].items()))
            row[f'{sf}_sec'] = t
            row[f'spread_{sf}'] = j.get('query_reps', {}).get(name, {}).get('spread')
            row[f'loadavg_{sf}'] = j.get('loadavg_start')
            row['query'] = name
        except Exception as e:
            row[f'{sf}_sec'] = None
            row[f'err_{sf}'] = str(e)
    if row.get('sf1_sec') and row.get('sf10_sec'):
        row['ratio'] = round(row['sf10_sec'] / row['sf1_sec'], 2)
    out[q] = row
open('PROBES_r19.json', 'w').write(json.dumps(out, indent=1) + '\n')
print('probes written:', {q: out[q].get('sf10_sec') for q in ('q96','q335','q208')})
PY
echo "=== leg 8: render SURVEY §8.1 from the committed JSONs ($(date)) ==="
python3 dev/render_summary_r19.py
echo "=== done ($(date)) ==="
