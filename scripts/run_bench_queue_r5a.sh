#!/bin/bash
# Round-5a hardware bench queue (VERDICT r4 items #2 and #7):
#   1. default-build geom confirm (the BENCH_r05 candidate)
#   2. packed_encoder / packed_stem / packed_all A/Bs (built+pinned in r4,
#      never measured on hardware)
#   3. flow-mode baselines per occlusion impl (splat / splat_nn /
#      diff_weights) so the splat-kernel win lands in the same artifact
#   4. depth-mode baseline
#   5. fresh xprof decomposition of the default geom step
# Usage: run_bench_queue_r5a.sh [out.jsonl]
set -u
OUT=${1:-/tmp/bench_r5a.jsonl}
cd "$(dirname "$0")/.."
: > "$OUT"

run() {
  local name=$1; shift
  echo "[bench_queue] $name ..." >&2
  local line rc
  # NOTE: capture python's exit status, not tail's (PIPESTATUS), and give
  # each arm a cold-compile-sized budget: the remote compile of the geom
  # step exceeded 580 s on a cold cache this round
  line=$(env "$@" timeout 1500 python bench.py 2>"/tmp/bench_arm_$name.err")
  rc=$?
  line=$(echo "$line" | tail -1)
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    line="{\"error\": \"bench exited rc=$rc\"}"
  fi
  echo "{\"arm\": \"$name\", \"result\": $line}" >> "$OUT"
  echo "[bench_queue] $name -> $line" >&2
}

run geom_default X=1
run packed_encoder BENCH_PACKED_ENCODER=1
run packed_stem BENCH_PACKED_STEM=1
run packed_all BENCH_PACKED_ENCODER=1 BENCH_PACKED_STEM=1
run flow_splat_nn BENCH_MODE=flow BENCH_FLOW_OCC=splat_nn
run flow_splat BENCH_MODE=flow BENCH_FLOW_OCC=splat
run flow_diff_weights BENCH_MODE=flow BENCH_FLOW_OCC=diff_weights
run depth_default BENCH_MODE=depth

echo "[bench_queue] xprof decomposition of the default geom step" >&2
timeout 580 python scripts/profile_step.py > /tmp/xprof_r5a.log 2>&1 || true
tail -3 /tmp/xprof_r5a.log >&2

echo "[bench_queue] done" >&2
cat "$OUT"
