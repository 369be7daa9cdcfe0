#!/bin/bash
# End-to-end plateau + kill->restore->continue exercise (VERDICT r4 item 9;
# reference analog: train.py:295 ReduceLROnPlateau + the --pretrained
# restart flow, which loses optimizer state — ours restores it).
#
# Phase A trains DAIN on the synthetic-motion Vimeo-layout set with a
# deliberately oversized LR (10x the reference 2e-3): training improves
# fast from init, then stalls at a high floor the plateau scheduler must
# step down through.  The run is SIGKILLed mid-training; phase B --resume
# restores the full train state (params, Adamax moments, plateau scale /
# num_bad_epochs, best-val watermark) from the last epoch checkpoint and
# continues to completion.  Inspect <save>/log.txt for (a) the epoch seam
# (no gap, no restart from 0) and (b) an lr-factor column step < 1.0.
#
# Usage: tools/run_plateau_resume.sh [save_dir] (default /tmp/run_plateau)
set -u
SAVE=${1:-/tmp/run_plateau}
DATA=/tmp/vimeo_syn
cd "$(dirname "$0")/.."

[ -d "$DATA/sequences" ] || python tools/make_synthetic_vimeo.py --out "$DATA" --n 12
rm -rf "$SAVE"

ARGS=(--dataset-path "$DATA" --save-path "$SAVE" --batch-size 3
      --num-epochs 24 --steps-per-epoch 40 --val-batches 2
      --lr 0.02 --patience 2 --factor 0.2)

echo "== phase A (killed mid-run) =="
timeout --signal=KILL 780 python apps/train.py "${ARGS[@]}"
echo "phase A exit: $? (137 = SIGKILL, expected)"
echo "log after phase A:"; cat "$SAVE/log.txt"

echo "== phase B (--resume) =="
timeout 2400 python apps/train.py "${ARGS[@]}" --resume
echo "phase B exit: $?"
echo "final log:"; cat "$SAVE/log.txt"

python - "$SAVE" <<'EOF'
import sys, numpy as np
rows = np.loadtxt(sys.argv[1] + "/log.txt", delimiter=",", ndmin=2)
epochs = rows[:, 0].astype(int)
assert (np.diff(epochs) == 1).all(), f"epoch seam broken: {epochs}"
scales = rows[:, 1]
assert scales.min() < 1.0, "no plateau reduction triggered"
first_red = int(epochs[np.argmax(scales < 1.0)])
print(f"OK: epochs {epochs[0]}..{epochs[-1]} contiguous across the kill; "
      f"first LR reduction at epoch {first_red} "
      f"(scale {scales.min():.3f}); final val loss {rows[-1, 3]:.4f}")
EOF
