#!/bin/bash
# Chain the full synthetic curriculum on the attached chip, process-recycled
# (see run_stage.sh for why): flow -> depth -> geom(+fix_flow, staged graft)
# -> geom ablation with the reference-disabled losses enabled.
# Usage: run_curriculum.sh <runs_dir> <data_dir> [start_phase]
set -u
RUNS=${1:-/tmp/r3_runs}; DATA=${2:-/tmp/synth_world_r3}; PHASE=${3:-flow}
cd "$(dirname "$0")/.."

phase_ge() {  # is $1 at-or-after $2 in the chain order
  order="flow depth geom ablation occab"
  a=$(echo "$order" | tr ' ' '\n' | grep -n "^$1$" | cut -d: -f1)
  b=$(echo "$order" | tr ' ' '\n' | grep -n "^$2$" | cut -d: -f1)
  [ "${a:-0}" -ge "${b:-9}" ]
}

if phase_ge flow "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/flow" 12000 2500 \
    --mode flow --data "$DATA" --eval_every 1000 --image_every 4000 || exit 1
fi
if phase_ge depth "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/depth" 6000 2500 \
    --mode depth --data "$DATA" --eval_every 1000 --image_every 4000 || exit 1
fi
if phase_ge geom "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/geom_fixflow" 8000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 2000 \
    --fix_flow \
    --graft_flow "$RUNS/flow/ckpt" --graft_depth "$RUNS/depth/ckpt" || exit 1
fi
if phase_ge ablation "$PHASE"; then
  bash scripts/run_stage.sh "$RUNS/geom_enabled" 3000 2500 \
    --mode geom --data "$DATA" --eval_every 1000 --image_every 3000 \
    --fix_flow \
    --enable_losses triangle,pnp,eight_point,depth_ssim,depth_consis \
    --graft_flow "$RUNS/flow/ckpt" --graft_depth "$RUNS/depth/ckpt" || exit 1
fi
if phase_ge occab "$PHASE"; then
  # measured A/B for the flow-occlusion deviation (PARITY.md): the faithful
  # diff_weights scheme, same budget as the first 3k steps of the splat run
  bash scripts/run_stage.sh "$RUNS/flow_diffw" 3000 2500 \
    --mode flow --data "$DATA" --eval_every 500 --image_every 9999999 \
    --flow_occ_impl diff_weights || exit 1
fi
echo "[curriculum] all phases done"
