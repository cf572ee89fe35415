#!/usr/bin/env python3
"""Per-query scale-step ratio table: sf1 time / sf0.1 time.

Usage: python3 tools/bench_ratio.py target/bench-baseline-sf0.1.json \
                                    target/bench-baseline-sf1.json [flag_ratio]

Reads the two full-precision local baseline files Bench writes, prints a
markdown table sorted by ratio desc, and flags entries above flag_ratio
(default 15 — the superlinear alarm for a 10x data step; a linear-cost
query should land near 10x, well-parallelized ones below).
"""
import sys, json, re


def load(p):
    txt = open(p).read()
    return {k: float(v) for k, v in
            re.findall(r'"([A-Za-z0-9_]+)":(-?[0-9.]+)', txt)}


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    common = sorted(set(a) & set(b))
    rows = []
    for k in common:
        if a[k] <= 0 or b[k] < 0:
            rows.append((float("inf"), k, a[k], b[k]))
        else:
            rows.append((b[k] / a[k], k, a[k], b[k]))
    rows.sort(reverse=True)
    print(f"| query | sf0.1 s | sf1 s | ratio | flag |")
    print(f"|---|---|---|---|---|")
    nflag = 0
    for r, k, ta, tb in rows:
        mark = "**>FLAG**" if r > flag else ""
        nflag += 1 if r > flag else 0
        print(f"| {k} | {ta:.3f} | {tb:.3f} | {r:.1f}x | {mark} |")
    tot_a = sum(v for v in a.values() if v > 0)
    tot_b = sum(v for v in b.values() if v > 0)
    print(f"\ntotal: sf0.1={tot_a:.1f}s sf1={tot_b:.1f}s "
          f"ratio={tot_b / tot_a:.1f}x; {nflag} queries over {flag}x; "
          f"{len(common)} common queries "
          f"({len(set(a) ^ set(b))} uncommon dropped)")


if __name__ == "__main__":
    main()
