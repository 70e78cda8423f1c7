#!/bin/bash
# Round-5 ONE-COMMAND full-curriculum reproduction (VERDICT r4 next #4):
# flow (occlusion schedule) -> depth -> geom_fixflow (staged graft) ->
# stage2 (lr 2e-5, nothing frozen), each at ~2x its round-4 budget, on a
# fresh exact-GT mover world. Every stage publishes the r5 synth_eval
# extensions: occluded/dynamic intersection EPE splits (VERDICT weak #5)
# and per-scene depth scale factors (weak #6).
#
# Endpoint targets (VERDICT #4 "done"): beat the best r4 per-task numbers
# (flow EPE <= 5.5, depth AbsRel < 0.31, pose ATE <= 0.027) or document
# saturation. Mirrors the reference's staged recipe
# (/root/reference/train.py:36-80) at ~16% of its 200k-step budget.
#
# Usage: run_round5.sh [runs_dir] [data_dir] [start_phase]
set -u
RUNS=${1:-/tmp/r5_runs}; DATA=${2:-/tmp/synth_world_r5}; PHASE=${3:-flow}
cd "$(dirname "$0")/.."

phase_ge() {  # is $1 at-or-after $2 in the chain order
  order="flow depth fixflow stage2"
  a=$(echo "$order" | tr ' ' '\n' | grep -n "^$1$" | cut -d: -f1)
  b=$(echo "$order" | tr ' ' '\n' | grep -n "^$2$" | cut -d: -f1)
  [ "${a:-0}" -ge "${b:-9}" ]
}

# the same mover world family as round 4 (exact-GT movers, seed 0);
# generated up front so every stage sees the identical data
if [ ! -f "$DATA/train.txt" ]; then
  python scripts/synth_world.py --out "$DATA" --n_movers 2 || exit 1
fi

if phase_ge flow "$PHASE"; then
  # occlusion schedule at the same 81% switch fraction as r4 (6.5k/8k):
  # splat_nn warm-up, guarded Pallas bilinear splat tail (the r5 kernel)
  bash scripts/run_stage.sh "$RUNS/flow" 16000 2500 \
    --mode flow --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --n_movers 2 --flow_occ_switch_step 13000 || exit 1
fi
if phase_ge depth "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/depth" 12000 2500 \
    --mode depth --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --n_movers 2 || exit 1
fi
if phase_ge fixflow "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/geom_fixflow" 16000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --n_movers 2 --fix_flow \
    --graft_flow "$RUNS/flow/ckpt" --graft_depth "$RUNS/depth/ckpt" || exit 1
fi
if phase_ge stage2 "$PHASE"; then
  # the measured r4 stage-2 recipe (configs/kitti_geom_stage2.yaml):
  # everything unfrozen at lr 2e-5, grafted whole from the fixflow ckpt
  bash scripts/run_stage.sh "$RUNS/geom_stage2" 16000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 9999999 \
    --n_movers 2 --lr 2e-5 \
    --graft_flow "$RUNS/geom_fixflow/ckpt" \
    --graft_depth "$RUNS/geom_fixflow/ckpt" || exit 1
fi

python scripts/publish_synth_results.py \
  --stages "$RUNS/flow" "$RUNS/depth" "$RUNS/geom_fixflow" "$RUNS/geom_stage2" \
  --suffix _r5 --md_out "$RUNS/training_records_r5.md" || true
echo "[round5] all phases done"
