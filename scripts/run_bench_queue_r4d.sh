#!/bin/bash
# Round-4d hardware bench queue: the remaining gated variants, run
# sequentially on the one attached chip. Each line prints the bench JSON
# tagged with its arm name into $OUT.
set -u
OUT=${1:-/tmp/bench_r4d.jsonl}
cd "$(dirname "$0")/.."
: > "$OUT"

run() {
  local name=$1; shift
  echo "[bench_queue] $name ..." >&2
  local line rc
  # no pipe inside the substitution: $? must be python's status, not tail's
  line=$(env "$@" timeout 1500 python bench.py 2>/dev/null)
  rc=$?
  line=$(echo "$line" | tail -1)
  # guard the crash/timeout case: an empty $line would emit malformed JSON
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    line="{\"error\": \"bench exited rc=$rc\"}"
  fi
  echo "{\"arm\": \"$name\", \"result\": $line}" >> "$OUT"
  echo "[bench_queue] $name -> $line" >&2
}

# combined warp-kernel extensions (each won independently in PERF.md r4)
run fused_bf16 BENCH_WARP_IMPL=pallas_fused BENCH_WARP_BF16=1
# packed encoder experiments (18dc734): exact-parity layouts, unbenched
run packed_encoder BENCH_PACKED_ENCODER=1 BENCH_WARP_IMPL=pallas_fused BENCH_WARP_BF16=1
run packed_stem BENCH_PACKED_STEM=1 BENCH_WARP_IMPL=pallas_fused BENCH_WARP_BF16=1
run packed_all BENCH_PACKED_ENCODER=1 BENCH_PACKED_STEM=1 BENCH_WARP_IMPL=pallas_fused BENCH_WARP_BF16=1

echo "[bench_queue] done" >&2
cat "$OUT"
