#!/usr/bin/env python3
"""Fold the post-fix q350/q354 fresh-JVM re-measures (input-scaled rewrite
width, commit 55a090b) into BENCH_sf10.json, with full disclosure: the two
rows move to min(old, new) per SF like the in-leg re-measure step, the
query names land in remeasured[] AND in a dedicated post_fix_remeasured
field naming the commit, and the >12x gate is recomputed. Every other row
is untouched leg output from the frozen pre-fix HEAD (3f767e9)."""
import json

out = json.load(open('BENCH_sf10.json'))
a = json.load(open('/tmp/rem17_sf1.json'))
b = json.load(open('/tmp/rem17_sf10.json'))
folded = []
for q in sorted(set(a['queries']) & set(b['queries'])):
    r = out['queries'].get(q, {})
    t0 = a['queries'][q]
    t1 = b['queries'][q]
    out['queries'][q] = {
        'sf1_sec': t0, 'sf10_sec': t1,
        'ratio': round(t1 / t0, 2) if t1 and t0 > 0 else None,
        'spread_sf1': a.get('query_reps', {}).get(q, {}).get('spread'),
        'spread_sf10': b.get('query_reps', {}).get(q, {}).get('spread'),
    }
    folded.append(q)
    if q not in out['remeasured']:
        out['remeasured'].append(q)
out['post_fix_remeasured'] = {
    'queries': folded,
    'commit': '55a090b',
    'note': 'q350/q354 re-measured fresh-JVM (reps=2, both SFs) AFTER the '
            'input-scaled rewrite-width fix that their >12x leg rows '
            'motivated; all other rows are the frozen pre-fix leg (3f767e9). '
            'Values are the post-fix measurements, not min(old,new): the '
            'code under test changed.'}
out['superlinear_gt12x'] = {
    q: r['ratio'] for q, r in out['queries'].items()
    if r['ratio'] and r['ratio'] > 12}
open('BENCH_sf10.json', 'w').write(json.dumps(out, indent=1) + '\n')
print('folded', folded)
print('superlinear >12x now:', out['superlinear_gt12x'])
for q in folded:
    print(' ', q, out['queries'][q])
