#!/usr/bin/env python3
"""Emit the sf0.1 -> sf1 per-query scaling-ratio table (SCALING.md
body) from two bench_full.json artifacts.

Usage: python3 tools/scaling_report.py <bench_full_sf01.json> <bench_full_sf1.json>
"""
import json
import sys

def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    # fixed-duration / self-measuring harnesses: wall-clock by
    # construction, a time ratio says nothing about data scaling
    harness = {"stream_soak", "stream_soak_ferret", "stream_rate_bench",
               "stream_param_sweep"}
    rows = []
    for k in sorted(set(qa) & set(qb)):
        r = qb[k] / qa[k] if qa[k] > 0 else float("inf")
        rows.append((k, qa[k], qb[k], r))
    rows.sort(key=lambda x: -x[3])
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for k, t0, t1, r in rows:
        tag = " (harness)" if k in harness else ""
        print(f"| {k}{tag} | {t0:.2f} | {t1:.2f} | {r:.1f}x |")
    real = [x for x in rows if x[0] not in harness]
    import statistics
    print()
    print(f"queries: {len(real)} (ex-harness); "
          f"median ratio {statistics.median(x[3] for x in real):.1f}x, "
          f"mean {statistics.mean(x[3] for x in real):.1f}x, "
          f"max {max(x[3] for x in real):.1f}x ({max(real, key=lambda x: x[3])[0]})")
    print(f"total ex-harness: sf0.1 {sum(x[1] for x in real):.1f} s -> "
          f"sf1 {sum(x[2] for x in real):.1f} s "
          f"({sum(x[2] for x in real)/sum(x[1] for x in real):.1f}x for 10x data)")

if __name__ == "__main__":
    main()
