#!/bin/bash
# Run one train_synth_long stage to completion, recycling the process every
# --max_steps_per_proc steps (the axon device relay leaks ~15-20 MB of host
# memory per h2d batch transfer; a 12k-step run would OOM a 125 GB host).
# Usage: run_stage.sh <out_dir> <total_steps> <per_proc_steps> [extra args...]
set -u
OUT=$1; TOTAL=$2; PER=$3; shift 3
mkdir -p "$OUT"
for i in $(seq 1 40); do
  # --resume is unconditional: it is a no-op when <out>/ckpt is empty, and
  # omitting it on a restart would retrain from scratch over the same out dir
  PYTHONUNBUFFERED=1 python "$(dirname "$0")/train_synth_long.py" \
    --out "$OUT" --steps "$TOTAL" --max_steps_per_proc "$PER" --resume "$@" \
    >> "$OUT/run.log" 2>&1
  rc=$?
  last=$(python - "$OUT" <<'PY'
import json, sys, os
p = os.path.join(sys.argv[1], "curves.jsonl")
step = 0
if os.path.exists(p):
    for line in open(p):
        try: step = max(step, json.loads(line).get("step", 0))
        except Exception: pass
print(step)
PY
)
  echo "[run_stage] iteration $i rc=$rc reached step $last/$TOTAL" >> "$OUT/run.log"
  if [ "$last" -ge "$TOTAL" ]; then echo "[run_stage] DONE" >> "$OUT/run.log"; exit 0; fi
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 143 ]; then
    echo "[run_stage] nonzero rc=$rc; retrying with resume" >> "$OUT/run.log"
  fi
done
echo "[run_stage] gave up after 40 iterations" >> "$OUT/run.log"; exit 1
