#!/usr/bin/env python3
"""sf1 scale-certification oracle compare: tools/local_verify.py per
key in a subprocess with a wall-clock timeout, so DuckDB-side
infeasibility (quadratic jaccard recomputes, recursive-CTE closures —
the documented reason four oracles are verified at small SF only)
surfaces as ORACLE_TIMEOUT instead of hanging the certification.

Usage: python3 tools/scale_compare.py <sfDir> <verifyOutDir> [timeoutSec]
Writes <verifyOutDir>/compare.json and prints one line per key.
"""
import json
import os
import subprocess
import sys

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    keys = sorted(set(os.listdir(out_dir)) - {"oracle_sql.json", "compare.json"})
    # resume: keep PASS/ROWS_ONLY results from a previous run
    results = {}
    if os.path.exists(f"{out_dir}/compare.json"):
        prev = json.load(open(f"{out_dir}/compare.json"))
        results = {k: v for k, v in prev.items()
                   if v.get("status") in ("PASS", "ROWS_ONLY")}
    keys = [k for k in keys if k not in results]
    for key in keys:
        if key not in oracle:
            # rows-only: count rows in the dump
            import glob
            files = glob.glob(f"{out_dir}/{key}/*.parquet")
            if not files:
                results[key] = {"status": "NO_DUMP"}
            else:
                import pyarrow.parquet as pq
                n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
                results[key] = {"status": "ROWS_ONLY", "rows": n,
                                "ok": n > 0}
            print(key, results[key]["status"], results[key].get("rows", ""))
            continue
        try:
            p = subprocess.run(
                [sys.executable, "tools/local_verify.py", sf_dir, out_dir, key],
                capture_output=True, text=True, timeout=timeout)
            line = (p.stdout.strip().splitlines() or [""])[-1]
            if not line:
                line = "rc=%d stderr: %s" % (
                    p.returncode, p.stderr.strip().splitlines()[-1][:150]
                    if p.stderr.strip() else "(empty — likely OOM-killed)")
            ok = ": PASS" in line
            results[key] = {"status": "PASS" if ok else "FAIL", "detail": line}
        except subprocess.TimeoutExpired:
            results[key] = {"status": "ORACLE_TIMEOUT",
                            "detail": f"DuckDB side exceeded {timeout}s"}
        print(key, results[key]["status"],
              results[key].get("detail", "")[:100])
    with open(f"{out_dir}/compare.json", "w") as f:
        json.dump(results, f, indent=1)
    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    n_fail = sum(1 for r in results.values() if r["status"] == "FAIL")
    n_to = sum(1 for r in results.values() if r["status"] == "ORACLE_TIMEOUT")
    n_ro = sum(1 for r in results.values() if r["status"] == "ROWS_ONLY")
    print(f"TOTAL: {len(results)} keys — {n_pass} pass, {n_fail} FAIL, "
          f"{n_to} oracle-timeout, {n_ro} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
