#!/bin/bash
# Round-5e quiet-chip queue: int8-encoder measurements, run in the gap
# between the depth and fixflow curriculum stages (the chip must be idle --
# the first bench_fp8 attempt ran against the live depth stage and measured
# 20x under free-chip rates; discarded).
set -u
OUT=${1:-/tmp/bench_r5e.jsonl}
cd "$(dirname "$0")/.."
: > "$OUT"

echo "[r5e] bench_fp8 (clean chip)" >&2
timeout 1500 python scripts/bench_fp8.py 2>/dev/null | tee /tmp/bench_fp8_r5_clean.log >&2

run() {
  local name=$1; shift
  echo "[r5e] $name ..." >&2
  local line rc
  line=$(env "$@" timeout 1500 python bench.py 2>/dev/null)
  rc=$?
  line=$(echo "$line" | tail -1)
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    line="{\"error\": \"bench exited rc=$rc\"}"
  fi
  echo "{\"arm\": \"$name\", \"result\": $line}" >> "$OUT"
  echo "[r5e] $name -> $line" >&2
}

# int8 encoder end-to-end: geom step, current default build otherwise
run int8_conv BENCH_INT8=1
run int8_shift BENCH_INT8=1 INT8_CONV_IMPL=shift

echo "[r5e] done" >&2
cat "$OUT"
