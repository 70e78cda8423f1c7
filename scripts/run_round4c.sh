#!/bin/bash
# Round-4c extended-budget queue, run after run_round4b.sh frees the chip.
# Everything RESUMES existing round-4 run dirs (run_stage.sh passes --resume
# unconditionally), pushing the measured-best recipes toward longer budgets:
#   1. geom_8point 6k -> 8k: complete the VERDICT #6 stability criterion
#      (stable >= 8k steps) for the tuned 1/100-weight eight_point arm.
#   2. geom_stage2_lr2 8k -> 20k: the recommended stage-2 recipe at 2.5x
#      budget -- does joint training keep improving depth while holding
#      flow/pose (the reference's 200k-step regime, scaled down)?
#   3. flow 8k -> 16k with the occlusion schedule's bilinear tail: push
#      the flow stage past its 8k budget on the stable occlusion model.
# Usage: run_round4c.sh [runs_dir] [data_dir]
set -u
RUNS=${1:-/tmp/r4_runs}; DATA=${2:-/tmp/synth_world_r4}
cd "$(dirname "$0")/.."

bash scripts/run_stage.sh "$RUNS/geom_8point" 8000 2500 \
  --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
  --fix_flow --enable_losses eight_point --set w_8point=0.001 \
  --graft_flow "$RUNS/flow/ckpt" --graft_depth "$RUNS/depth/ckpt"

bash scripts/run_stage.sh "$RUNS/geom_stage2_lr2" 20000 2500 \
  --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
  --lr 2e-5 \
  --graft_flow "$RUNS/geom_fixflow/ckpt" --graft_depth "$RUNS/geom_fixflow/ckpt"

bash scripts/run_stage.sh "$RUNS/flow" 16000 2500 \
  --mode flow --data "$DATA" --eval_every 1000 --image_every 9999999 \
  --flow_occ_switch_step 6500

echo "[round4c] all phases done"
