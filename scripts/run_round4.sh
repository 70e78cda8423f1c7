#!/bin/bash
# Round-4 training queue on the attached chip (serialized: one TPU client at
# a time). Produces the VERDICT r3 evidence items:
#   #2 pose ATE/RE trajectories (synth_eval now scores the PoseNet every eval)
#   #3 loss_base_scale=1 measured end-to-end (geom_fixflow_ls1)
#   #4 stage-2 recipe sweep (lr / fix_pose) aiming at flow<=7.5 AND a1 near peak
#   #5 dynamic-region dial A/B (dyna_photo_weight 4 vs 2)
#   #6 tuned reference-disabled loss (eight_point at 1/100 reference weight)
#   #7 occlusion schedule single-run record (flow stage uses the switch)
# Usage: run_round4.sh <runs_dir> <data_dir> [start_phase]
set -u
RUNS=${1:-/tmp/r4_runs}; DATA=${2:-/tmp/synth_world_r4}; PHASE=${3:-flow}
cd "$(dirname "$0")/.."

phase_ge() {  # is $1 at-or-after $2 in the chain order
  order="flow depth fixflow ls1 stage2a stage2b stage2dyn eightpoint"
  a=$(echo "$order" | tr ' ' '\n' | grep -n "^$1$" | cut -d: -f1)
  b=$(echo "$order" | tr ' ' '\n' | grep -n "^$2$" | cut -d: -f1)
  [ "${a:-0}" -ge "${b:-9}" ]
}

if phase_ge flow "$PHASE"; then
  # occlusion schedule: splat_nn to 6500, bilinear splat for the tail
  bash scripts/run_stage.sh "$RUNS/flow" 8000 2500 \
    --mode flow --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --flow_occ_switch_step 6500 || exit 1
fi
if phase_ge depth "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/depth" 6000 2500 \
    --mode depth --data "$DATA" --eval_every 1000 --image_every 9999999 || exit 1
fi
if phase_ge fixflow "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/geom_fixflow" 8000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 4000 \
    --fix_flow \
    --graft_flow "$RUNS/flow/ckpt" --graft_depth "$RUNS/depth/ckpt" || exit 1
fi
if phase_ge ls1 "$PHASE"; then
  # VERDICT #3: the half-resolution loss dial, same recipe as geom_fixflow
  bash scripts/run_stage.sh "$RUNS/geom_fixflow_ls1" 8000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --fix_flow --loss_base_scale 1 \
    --graft_flow "$RUNS/flow/ckpt" --graft_depth "$RUNS/depth/ckpt" || exit 1
fi
if phase_ge stage2a "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/geom_stage2_lr2" 8000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --lr 2e-5 \
    --graft_flow "$RUNS/geom_fixflow/ckpt" --graft_depth "$RUNS/geom_fixflow/ckpt" || exit 1
fi
if phase_ge stage2b "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/geom_stage2_fixpose" 8000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --lr 5e-5 --fix_pose \
    --graft_flow "$RUNS/geom_fixflow/ckpt" --graft_depth "$RUNS/geom_fixflow/ckpt" || exit 1
fi
if phase_ge stage2dyn "$PHASE"; then
  # VERDICT #5: double the dynamic-region photometric weight
  bash scripts/run_stage.sh "$RUNS/geom_stage2_dyn4" 8000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --lr 2e-5 --set dyna_photo_weight=4.0 \
    --graft_flow "$RUNS/geom_fixflow/ckpt" --graft_depth "$RUNS/geom_fixflow/ckpt" || exit 1
fi
if phase_ge eightpoint "$PHASE"; then
  # VERDICT #6: eight_point at 1/100 the reference weight (0.1 -> 0.001)
  bash scripts/run_stage.sh "$RUNS/geom_8point" 6000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --fix_flow --enable_losses eight_point --set w_8point=0.001 \
    --graft_flow "$RUNS/flow/ckpt" --graft_depth "$RUNS/depth/ckpt" || exit 1
fi
echo "[round4 queue] all phases done"
