#!/usr/bin/env bash
# Capture the round-4 hardware evidence set sequentially on the tunneled
# TPU (single-tenant chip: never run two of these concurrently).
# Each step writes stdout/stderr under docs/hardware_r4/ and a .rc marker,
# so a mid-sequence tunnel outage still leaves every earlier artifact.
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

python - <<'EOF' > "$OUT/manifest.json" 2> "$OUT/manifest.err"
import json, subprocess, time
import jax
print(json.dumps({
    "captured_unix": time.time(),
    "captured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "jax": jax.__version__,
    "devices": [str(d) for d in jax.devices()],
    "git_head": subprocess.run(["git", "rev-parse", "HEAD"],
                               capture_output=True, text=True).stdout.strip(),
}, indent=1))
EOF

run bench            2400 python bench.py
run ab_defer_858k    1500 python tools/ab_defer_858k.py
run bitwise_xpath     900 python tools/bitwise_xpath.py
run trace_deferred   1200 python tools/trace_summary.py \
                          --json "$OUT/trace_deferred_858k.json"
run bench_pruned_knn 1500 python tools/bench_pruned_knn.py
run knn_recall       1200 python benchmarks/knn_recall.py
run ab_midn          1800 python tools/ab_midn.py
echo ALL_DONE > "$OUT/ALL_DONE"
