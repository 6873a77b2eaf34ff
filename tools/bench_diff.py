#!/usr/bin/env python3
"""Compare two bench_full.json artifacts: per-face cold/warm deltas.

Usage: bench_diff.py BEFORE.json AFTER.json [--min-delta 0.3]
Prints faces sorted by warm delta (after - before), plus totals.
"""
import json, sys

def load(p):
    d = json.load(open(p))
    import re
    # Driver artifacts (BENCH_r*.json) nest the map under "parsed"; a
    # bench_full.json has it at top level. Fail with a clear message
    # rather than a KeyError when neither shape matches.
    if 'queries' not in d and isinstance(d.get('parsed'), dict):
        d = d['parsed']
    if 'queries' not in d:
        sys.exit(f"{p}: no 'queries' map found (not a bench artifact?)")
    cold, warm = {}, d.get('warm', {})
    for k, v in d['queries'].items():
        m = re.match(r'(.*)#(\d+)$', k)
        if m:
            if m.group(2) == '1':
                cold[m.group(1)] = v
        else:
            cold[k] = v
    wm = d.get('warm_median')
    if wm:
        warm = wm
    return cold, warm

a_cold, a_warm = load(sys.argv[1])
b_cold, b_warm = load(sys.argv[2])
# accept both '--min-delta 0.3' (space) and '--min-delta=0.3'
thr = 0.3
rest = sys.argv[3:]
if rest:
    if rest[0].startswith('--min-delta='):
        thr = float(rest[0].split('=', 1)[1])
    elif rest[0] == '--min-delta' and len(rest) > 1:
        thr = float(rest[1])
    else:
        sys.exit(f"unrecognized arguments: {rest} "
                 "(expected --min-delta X or --min-delta=X)")
rows = []
for k in sorted(set(a_warm) | set(b_warm)):
    aw, bw = a_warm.get(k), b_warm.get(k)
    if aw is None or bw is None:
        rows.append((0, k, aw, bw, 'NEW' if aw is None else 'GONE'))
        continue
    rows.append((bw - aw, k, aw, bw, ''))
rows.sort(key=lambda r: r[0])
for d, k, aw, bw, tag in rows:
    if tag or abs(d) >= thr:
        print(f"{d:+7.2f}  {aw if aw is not None else '-':>7} -> "
              f"{bw if bw is not None else '-':>7}  {k} {tag}")
common = [k for k in a_warm if k in b_warm]
print(f"\nshared faces: {len(common)}  warm total "
      f"{sum(a_warm[k] for k in common):.1f} -> "
      f"{sum(b_warm[k] for k in common):.1f}")
cc = [k for k in a_cold if k in b_cold]
print(f"cold total {sum(a_cold[k] for k in cc):.1f} -> "
      f"{sum(b_cold[k] for k in cc):.1f}")
