#!/bin/bash
# Round-4 follow-on TPU work, chained after run_round4.sh's queue:
#   1. fused-warp microbench (warp_impl=pallas_fused vs pallas vs xla)
#   2. bench.py A/B: geom step fps with pallas vs pallas_fused sampling
#   3. static-world depth control (ROADMAP: isolate whether the moving
#      planes cause the within-run depth degradation seen in depth_r4)
# Usage: run_round4b.sh [runs_dir]
set -u
RUNS=${1:-/tmp/r4_runs}
cd "$(dirname "$0")/.."
mkdir -p "$RUNS"

echo "[round4b] warp microbench" >&2
python scripts/bench_warp_window.py 16 > "$RUNS/bench_warp_fused.log" 2>&1

echo "[round4b] bench.py pallas vs pallas_fused vs bf16-extended" >&2
BENCH_WARP_IMPL=pallas python bench.py > "$RUNS/bench_pallas.json" 2> "$RUNS/bench_pallas.err"
BENCH_WARP_IMPL=pallas_fused python bench.py > "$RUNS/bench_fused.json" 2> "$RUNS/bench_fused.err"
BENCH_WARP_IMPL=pallas BENCH_WARP_BF16=1 python bench.py > "$RUNS/bench_bf16.json" 2> "$RUNS/bench_bf16.err"

echo "[round4b] xprof step profile (current default build)" >&2
python scripts/profile_step.py > "$RUNS/profile_r4.log" 2>&1 || true

echo "[round4b] static-world depth control" >&2
bash scripts/run_stage.sh "$RUNS/depth_static" 6000 2500 \
  --mode depth --data /tmp/synth_world_static --n_movers 0 \
  --eval_every 1000 --image_every 9999999

echo "[round4b] dynamic-mask bound A/B (VERDICT #5 second lever)" >&2
# tighter beta -> more pixels classified dynamic -> the 2x-weighted dyna
# photometric term covers more of the movers (ops/inverse_warp_multi.py:80)
bash scripts/run_stage.sh "$RUNS/geom_stage2_dynmask" 8000 2500 \
  --mode geom --data /tmp/synth_world_r4 --eval_every 1000 --image_every 9999999 \
  --lr 2e-5 --set flow_consist_beta=0.25 \
  --graft_flow "$RUNS/geom_fixflow/ckpt" --graft_depth "$RUNS/geom_fixflow/ckpt"

echo "[round4b] done" >&2
