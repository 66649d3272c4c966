#!/usr/bin/env python3
"""Recall@K of each ferret engine's RETURNED top-K against the
brute-force exact-EMD ground truth (graft.RefFerret truth).

r12 measured engine-vs-engine top-10 identity overlap (0.19/0.28)
but left "which engine is closer to the TRUE exact-EMD top-10?"
unadjudicated. This scores both engines against both truths:

  truth_graft  — exact EMD over ALL db candidates, graft features
  truth_binary — exact EMD over ALL db candidates, the binary's OWN
                 cass_img_extract features (corel.txt)

The 2x2 recall matrix localizes a gap: an engine scoring high
against its own-feature truth but low against the other's says the
difference is FEATURE EXTRACTION (float-vs-double descriptors), not
the index/probe family.

Binary output lines carry no query name; identity is recovered from
the twin anchor (top-1 distance ~1e-6), like ferret_overlap.py.

Usage: ferret_recall.py <truth_parquet_glob> <graft_topk_glob> <binary_output.txt> [K]
"""
import sys
import duckdb


def load_truth(glob, k):
    rows = duckdb.sql(
        f"SELECT query_img, cand_img FROM '{glob}' "
        f"WHERE rank <= {k} ORDER BY query_img, rank").fetchall()
    truth = {}
    for q, c in rows:
        truth.setdefault(q, []).append(c)
    return truth


def load_graft(glob, k):
    rows = duckdb.sql(
        f"SELECT query_img, cand_img FROM '{glob}' "
        f"WHERE rank <= {k} ORDER BY query_img, rank").fetchall()
    out = {}
    for q, c in rows:
        out.setdefault(q, []).append(c)
    return out


def load_binary(path, k):
    out = {}
    unanchored = 0
    for ln in open(path):
        entries = [e for e in ln.strip().split('\t') if ':' in e]
        if not entries:
            continue
        names = [e.rsplit(':', 1)[0].split('/')[-1] for e in entries]
        if float(entries[0].rsplit(':', 1)[1]) > 1e-3:
            unanchored += 1
            continue
        out[names[0]] = names[:k]
    return out, unanchored


def recall(engine, truth):
    qs = sorted(set(engine) & set(truth))
    if not qs:
        return 0.0, 0
    r = sum(len(set(engine[q]) & set(truth[q])) / len(truth[q]) for q in qs)
    return r / len(qs), len(qs)


def main():
    truth_glob, graft_glob, binary_txt = sys.argv[1], sys.argv[2], sys.argv[3]
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    truth = load_truth(truth_glob, k)
    graft = load_graft(graft_glob, k)
    binary, unanchored = load_binary(binary_txt, k)
    rg, ng = recall(graft, truth)
    rb, nb = recall(binary, truth)
    print(f"truth={truth_glob} K={k} truth_queries={len(truth)} "
          f"binary_unanchored={unanchored}")
    print(f"graft  recall@{k}={rg:.3f} over {ng} queries")
    print(f"binary recall@{k}={rb:.3f} over {nb} queries")


if __name__ == '__main__':
    main()
