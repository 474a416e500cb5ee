#!/usr/bin/env python3
"""Render SURVEY.md §8.1 (round-19 measured scale summary) FROM the
committed chain artifacts — the r18 verdict item 1's structural fix:
every number in the summary is read out of a JSON this script names, so
a prose number that matches no artifact cannot be written. Idempotent:
replaces whatever sits between the R19-SUMMARY markers."""
import json

def load(p):
    try:
        return json.load(open(p))
    except Exception:
        return None

lines = []

off = load('BENCH_r19_official.json')
if off:
    errs = off.get('errors', {})
    lines.append(
        f"- **Official sf0.1 board** (BENCH_r19_official.json): "
        f"{len(off['queries'])} queries, **{off['value']:.1f} s** "
        f"(min-of-{off['reps']}), {len(errs)} errors"
        f"{' (' + ', '.join(errs) + ')' if errs else ''}, "
        f"flagged {off.get('flagged', [])}, launch loadavg "
        f"{off['loadavg_start'][0]:.2f}.")

sf1 = load('BENCH_sf1_full.json')
if sf1:
    sup = sf1.get('superlinear_gt12x', {})
    lines.append(
        f"- **First decade** (BENCH_sf1_full.json, full board, reps=1): "
        f"{sf1['total_sf0.1']:.1f} s sf0.1 -> {sf1['total_sf1']:.1f} s sf1 "
        f"= **{sf1['total_sf1']/sf1['total_sf0.1']:.2f}x at 10x data**, "
        f"{len(sf1.get('errors_sf1', {}))} errors, >12x entries: "
        f"{sup if sup else 'none'}.")

sf10 = load('BENCH_sf10.json')
if sf10:
    sup = sf10.get('superlinear_gt12x', {})
    lines.append(
        f"- **Second decade** (BENCH_sf10.json, depth tier, fresh-JVM "
        f"chunks, min-of-2): {sf10['total_sf1']:.1f} s sf1 -> "
        f"{sf10['total_sf10']:.1f} s sf10 = "
        f"**{sf10['total_sf10']/sf10['total_sf1']:.2f}x/decade**, "
        f"{len(sf10.get('errors_sf10', {}))} errors, "
        f"remeasured {sf10.get('remeasured', [])}, >12x: "
        f"{sup if sup else 'none'}, leg-start loadavg "
        f"sf10 {sf10['loadavg_sf10'][0]:.2f}.")

for p, nm in (('BENCH_skew.json', 'sf1zipf'), ('BENCH_skew10.json', 'sf10zipf')):
    sk = load(p)
    if sk:
        qs = sk.get('queries', {})
        worst = max(((r.get('ratio') or 0), q) for q, r in qs.items()) \
            if qs else (0, '-')
        bad = sk.get('pathological_gt3x',
                     {q: r for q, r in qs.items() if (r.get('ratio') or 0) > 3})
        lines.append(
            f"- **Skew tier {nm}** ({p}): {len(qs)} stages, "
            f"worst zipf/uniform ratio {worst[0]:.2f}x ({worst[1]}), "
            f">3x pathological: {sorted(bad) if bad else 'none'}.")

probes = load('PROBES_r19.json')
if probes:
    for q in ('q96', 'q335', 'q208'):
        r = probes.get(q, {})
        if r.get('sf10_sec') is not None:
            lines.append(
                f"- **Probe {r.get('query', q)}** (PROBES_r19.json, "
                f"dedicated fresh JVM, min-of-2, quiet-gated): "
                f"{r.get('sf1_sec')} s sf1 -> {r.get('sf10_sec')} s sf10 "
                f"(ratio {r.get('ratio')}, sf10 spread "
                f"{r.get('spread_sf10')}, sf10 loadavg "
                f"{(r.get('loadavg_sf10') or [None])[0]}).")

for p, q in (('PROFILE_q335.json', 'q335'), ('PROFILE_q96.json', 'q96')):
    pr = load(p)
    if pr and pr.get('sf10'):
        lines.append(
            f"- **Profile {q}** ({p}): sf1 {pr['sf1']['total_sec']:.1f} s, "
            f"sf10 {pr['sf10']['total_sec']:.1f} s "
            f"(ratio {pr.get('total_ratio')}), "
            f"{len(pr['sf10'].get('jobs', []))} jobs profiled at sf10.")

pl = load('PLANS_q351.json')
if pl and pl.get('sf1') and pl.get('sf10'):
    def cust(sf):
        for r in pl[sf]:
            if r['build_side'] == 'customer':
                return r['decision']
        return '?'
    lines.append(
        f"- **q351 plan census** (PLANS_q351.json): customer build side "
        f"decision sf1={cust('sf1')}, sf10={cust('sf10')}; "
        f"n_broadcast_in_plan sf1={pl['sf1'][0]['n_broadcast_in_plan']}, "
        f"sf10={pl['sf10'][0]['n_broadcast_in_plan']}.")

body = '\n'.join(lines) if lines else '(no artifacts found)'
p = 'SURVEY.md'
src = open(p).read()
b, e = '<!-- R19-SUMMARY-BEGIN -->', '<!-- R19-SUMMARY-END -->'
i, j = src.index(b) + len(b), src.index(e)
open(p, 'w').write(src[:i] + '\n' + body + '\n' + src[j:])
print(f'rendered {len(lines)} summary lines into SURVEY.md')
