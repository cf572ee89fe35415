#!/usr/bin/env python3
"""Merge sf10 bench runs and print the BENCH_NOTES ratio table.

Inputs: target/bench-baseline-sf10.json (run-3 map, -1.0 = disk-window
failure), plus any `[bench] done <q> <sec>` lines from re-measure run
stderr files given as argv. Re-measured values REPLACE the map's.
Ratios against target/bench-baseline-sf1.json; flags >15x.
"""
import json, re, sys

sf1 = json.load(open('BENCH_sf1.json'))['queries']
sf10 = json.load(open('BENCH_sf10.json'))['queries']
for f in sys.argv[1:]:
    for m in re.finditer(r'\[bench\] done (\w+) ([0-9.]+)', open(f, errors='replace').read()):
        q, t = m.group(1), float(m.group(2))
        if q != 'q3_join' or sf10.get('q3_join') in (None, -1.0):
            sf10[q] = t
missing = [q for q, t in sorted(sf10.items()) if t == -1.0]
measured = {q: t for q, t in sf10.items() if t != -1.0}
print(f"measured {len(measured)} / map {len(sf10)}; still failed/unmeasured: {missing}")
print(f"sum {sum(measured.values()):.1f}s  sf1 sum {sum(sf1.values()):.1f}s")
rows = []
for q in sorted(measured):
    if q in sf1 and sf1[q] > 0:
        rows.append((measured[q] / sf1[q], q, sf1[q], measured[q]))
rows.sort(reverse=True)
print("\n| query | sf1 s | sf10 s | ratio |")
print("|---|---|---|---|")
for r, q, a, b in rows[:15]:
    print(f"| {q} | {a:.1f} | {b:.1f} | {r:.1f}x |")
import statistics
print(f"\nmedian ratio {statistics.median(r for r,_,_,_ in rows):.2f}, "
      f">15x count {sum(1 for r,_,_,_ in rows if r>15)}")
json.dump({'sf': 10, 'queries': sf10}, open('BENCH_sf10.json','w'), indent=1, sort_keys=True)
