#!/usr/bin/env python3
"""Top-K agreement between the reference ferret binary's output.txt and
graft's RefFerret topk parquet, on the twin-anchored corpus.

The binary's non-tracing output lines carry no query name (rank->name
is only populated under ENABLE_TRACING), but every query in the
RefFerret corpus is a byte-identical twin of one database image, so a
line's query identity is recovered from its top-1 entry (the twin,
distance ~1e-6). Lines whose top-1 is not a near-zero match are
counted as unanchored and excluded from the overlap denominator
(reported separately).

Usage: ferret_overlap.py <output.txt> <graft_topk_parquet_glob> [K]
"""
import sys
import duckdb

def main():
    out_txt = sys.argv[1]
    topk_glob = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    binary = {}
    unanchored = 0
    for ln in open(out_txt):
        entries = [e for e in ln.strip().split('\t') if ':' in e]
        if not entries:
            continue
        names = [e.rsplit(':', 1)[0].split('/')[-1] for e in entries]
        top1_dist = float(entries[0].rsplit(':', 1)[1])
        if top1_dist > 1e-3:
            unanchored += 1
            continue
        binary[names[0]] = names[:k]

    rows = duckdb.sql(
        f"SELECT query_img, cand_img FROM '{topk_glob}' "
        f"WHERE rank <= {k} ORDER BY query_img, rank").fetchall()
    graft = {}
    for q, c in rows:
        graft.setdefault(q, []).append(c)

    common = sorted(set(binary) & set(graft))
    overlaps = []
    top1_agree = 0
    for q in common:
        b, g = set(binary[q]), set(graft[q])
        overlaps.append(len(b & g) / max(len(b), 1))
        if binary[q][0] == graft[q][0]:
            top1_agree += 1
    n = len(common)
    mean_ov = sum(overlaps) / n if n else 0.0
    print(f"queries_compared={n} binary_unanchored={unanchored} "
          f"graft_only={len(set(graft) - set(binary))} "
          f"top1_agreement={top1_agree}/{n} "
          f"mean_top{k}_overlap={mean_ov:.3f}")

if __name__ == '__main__':
    main()
