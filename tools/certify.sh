#!/usr/bin/env bash
# One-command round certification (judge item r10#8): reproduces the
# three driver artifacts at HEAD in one invocation —
#   1. CORRECTNESS — graft.Verify dump at sf0.01 + the DuckDB oracle
#      compare (tools/local_verify.py mirrors the driver's check:
#      sorts columns by name, sorts rows, compares values + hash);
#   2. BENCH — graft.Bench at sf0.1, local[32], median-of-3, short
#      contract line + full per-query medians/pass-spread JSON;
#   3. REFBENCH — the head-to-head vs the reference's own
#      dedup_pthreads binary on the committed deterministic corpus
#      (graft.RefCorpus), REFBENCH.md "Setup" verbatim.
#
# This is a shell script rather than a pure sbt task because step 1's
# oracle compare runs in DuckDB (python, driver-side tooling) — sbt
# can only drive the JVM halves. Everything lands under target/cert/.
#
# Usage: tools/certify.sh [--skip-refbench]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=target/cert
mkdir -p "$OUT"
SKIP_REF="${1:-}"

echo "=== [1/3] CORRECTNESS: Verify @ sf0.01 + DuckDB oracle ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT/verify_sf0.01" \
  > "$OUT/verify.log" 2>&1
python3 tools/local_verify.py /root/testdata/sf0.01 "$OUT/verify_sf0.01" \
  | tee "$OUT/CORRECTNESS.txt"
if grep -qE "MISMATCH|MISSING|EMPTY" "$OUT/CORRECTNESS.txt"; then
  echo "CORRECTNESS: RED (see $OUT/CORRECTNESS.txt)"; exit 1
fi
echo "CORRECTNESS: green"

echo "=== [2/3] BENCH: sf0.1, local[32], median-of-3 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  2> "$OUT/bench.stderr" | grep '"metric"' | tee "$OUT/BENCH.json"
cp target/bench_full.json "$OUT/BENCH_full.json"

echo "=== [2b/3] BENCH @ sf1 (10x): the standing scale-certification gate ==="
# r15 verdict #1: the full-suite bench at 10x the driver SF runs every
# round at final HEAD, at the DEFAULT driver heap (the r15 one-off
# needed SPARK_DRIVER_MEM=48g because memory sinks collected streaming
# results onto the driver; r16 removed every corpus-scaled memory
# sink, so 8g is the bar). One measured pass: the sf1 point is a
# scale reading (step-up ratios vs sf0.1), not a median-precision
# race. Gate: 0 failed keys.
SF1=target/sf1
if [ ! -d "$SF1" ]; then
  echo "generating $SF1 (GenScale 10x from sf0.1)..."
  sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 $SF1 10" \
    > "$OUT/genscale.log" 2>&1
fi
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_PASSES=1 \
  sbt -batch "runMain graft.Bench" \
  2> "$OUT/bench_sf1.stderr" | grep '"metric"' | tee "$OUT/BENCH_sf1.json"
cp target/bench_full.json "$OUT/BENCH_sf1_full.json"
if python3 -c "import json,sys; d=json.load(open('$OUT/BENCH_sf1.json')); sys.exit(0 if d['n_failed']==0 else 1)"; then
  echo "BENCH sf1: green (0 failed at default heap)"
else
  echo "BENCH sf1: RED (failed keys at sf1 — see $OUT/BENCH_sf1.json)"; exit 1
fi

if [ "$SKIP_REF" != "--skip-refbench" ]; then
  echo "=== [3/3] REFBENCH: head-to-head vs dedup_pthreads ==="
  CORPUS=/tmp/refbench/corpus
  REFBIN=/root/reference/apps/dedup/bin/dedup_pthreads
  sbt -batch "runMain graft.RefCorpus /root/testdata/sf0.1 $CORPUS 80 6" \
    > "$OUT/refcorpus.log" 2>&1
  if [ -x "$REFBIN" ]; then
    # reference side: 3 runs at t=32, its own post-setup pipeline clock.
    # DEDUP_DIR_LOG is MANDATORY: print_time() sprintf's getenv(...)
    # unchecked (new_dedup.c:99) — without it the binary dies before
    # printing anything, which silently empties this file.
    : > "$OUT/REFBENCH_ref.txt"
    for i in 1 2 3; do
      rm -rf /tmp/refbench/ref_out /tmp/refbench/ref_log
      mkdir -p /tmp/refbench/ref_out /tmp/refbench/ref_log
      DEDUP_DIR_LOG=/tmp/refbench/ref_log \
        "$REFBIN" -c -v -t 32 -i "$CORPUS" -o /tmp/refbench/ref_out \
        2>&1 | grep -i "Time Processing" >> "$OUT/REFBENCH_ref.txt" || true
    done
    if [ ! -s "$OUT/REFBENCH_ref.txt" ]; then
      echo "REFBENCH: reference binary produced no timing output" >&2
      exit 1
    fi
    cat "$OUT/REFBENCH_ref.txt"
  else
    echo "reference binary not present — skipping its side" \
      | tee "$OUT/REFBENCH_ref.txt"
  fi
  # graft side: cold + 5 warm passes, median reported by the harness
  SPARK_DRIVER_MEM=24g sbt -batch \
    "runMain graft.RefCompare $CORPUS /tmp/refbench/graft_out *.bin global 5" \
    2> "$OUT/refcompare.stderr" | grep '"harness"' | tee "$OUT/REFBENCH_graft.json"
fi

echo "=== certification artifacts in $OUT ==="
ls -l "$OUT"
