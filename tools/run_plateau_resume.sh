#!/bin/bash
# End-to-end plateau + kill->restore->continue exercise (VERDICT r4 item 9;
# reference analog: train.py:295 ReduceLROnPlateau + the --pretrained
# restart flow, which loses optimizer state — ours restores it).
#
# Phase A trains DAIN on a synthetic-motion Vimeo-layout set (18 triplets:
# 12 train / 6 test, so batch-3 validation forms 2 real batches) at the
# reference LR with patience 1: on tiny data the val metric stalls within a
# few epochs, stepping the scheduler.  Phase A is SIGKILLed as soon as
# log.txt holds >= KILL_AFTER epoch rows (mid-run by construction, not a
# compile-window guess); phase B --resume restores the full train state
# (params, Adamax moments, plateau scale / best / num_bad_epochs, best-val
# watermark) from the last epoch checkpoint and continues to completion.
# The checker asserts (a) a contiguous epoch seam across the kill and
# (b) at least one lr-factor step < 1.0.
#
# Usage: tools/run_plateau_resume.sh [save_dir] (default /tmp/run_plateau)
set -u
SAVE=${1:-/tmp/run_plateau}
DATA=/tmp/vimeo_syn18
KILL_AFTER=${KILL_AFTER:-3}
cd "$(dirname "$0")/.."

[ -d "$DATA/sequences" ] || \
    python tools/make_synthetic_vimeo.py --out "$DATA" --n 18 --test-frac 0.34
rm -rf "$SAVE"

ARGS=(--dataset-path "$DATA" --save-path "$SAVE" --batch-size 3
      --num-epochs 24 --steps-per-epoch 40 --val-batches 2
      --patience 1 --factor 0.2)

echo "== phase A (SIGKILLed after $KILL_AFTER logged epochs) =="
python apps/train.py "${ARGS[@]}" & PID=$!
for i in $(seq 1 360); do
    sleep 5
    kill -0 "$PID" 2>/dev/null || break
    n=$(wc -l < "$SAVE/log.txt" 2>/dev/null || echo 0)
    if [ "$n" -ge "$KILL_AFTER" ]; then
        echo "log has $n rows -> SIGKILL $PID"
        kill -9 "$PID"
        break
    fi
done
wait "$PID" 2>/dev/null
echo "phase A exit: $? (137 = SIGKILL, expected)"
echo "log after phase A:"; cat "$SAVE/log.txt"

echo "== phase B (--resume) =="
timeout 3000 python apps/train.py "${ARGS[@]}" --resume
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
