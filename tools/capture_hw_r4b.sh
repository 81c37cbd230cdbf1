#!/usr/bin/env bash
# Second tranche of round-4 hardware evidence: the xlarge (5M-cell) tiers
# and the end-to-end run_harmony() tier harness (small/medium/lisi/large,
# incl. the 69k torch cross-impl gate). Run AFTER capture_hw_r4.sh — the
# chip is single-tenant.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=docs/hardware_r4
mkdir -p "$OUT"

run() { # run NAME TIMEOUT_S CMD...  (skips steps that already succeeded)
  local name=$1 budget=$2; shift 2
  if [ -f "$OUT/$name.rc" ] && [ "$(cat "$OUT/$name.rc")" = "0" ]; then
    echo "=== $name already ok, skipping" >&2
    return
  fi
  echo "=== $name (budget ${budget}s): $*" >&2
  local t0=$SECONDS
  timeout "$budget" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "$rc" > "$OUT/$name.rc"
  echo "=== $name done rc=$rc in $((SECONDS - t0))s" >&2
}

run xlarge_defer    2400 python benchmarks/xlarge_defer.py
run run_benchmarks  4500 python benchmarks/run_benchmarks.py \
                         small medium lisi large
run bench_lisi_large 2400 python benchmarks/run_benchmarks.py lisi_large
run bench_xlarge    2400 python benchmarks/run_benchmarks.py xlarge
echo ALL_DONE_B > "$OUT/ALL_DONE_B"
