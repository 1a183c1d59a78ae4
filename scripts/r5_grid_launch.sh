#!/bin/bash
# Launch the T x N replication grid (VERDICT r4 #2) against the round-5
# members.  Model-choice rule, frozen before any grid execution:
#   EX        = best val-map-qualified single-task 0.5-scale member
#               (g2e4, val-map dice 0.6442 — the 0.5 analysis scale keeps
#               the 17-config grid inside the round's TPU window; the
#               scale-1.0 val winner f2e4 would cost ~2.5x per sample)
#   EXnolatent= nolat (inject_no_bottleneck — see r4_drive_b.py stage 4)
#   EXlatent  = latb  (bottleneck-only injection)
#   MA        = ma1@1.0 (the r2 protocol match for the reference's MA runs)
set -e
cd "$(dirname "$0")/.."
EX=$(cat checkpoints/r4_g2e4/DRIVE_DONE)
NOLAT=$(cat checkpoints/r5_nolat/DRIVE_DONE)
LATB=$(cat checkpoints/r5_latb/DRIVE_DONE)
MA=$(cat checkpoints/r5_ma1/DRIVE_DONE)
exec python scripts/replication_grid.py \
  --model "EX=${EX}@0.5" \
  --model "EXnolatent=${NOLAT}@0.5" \
  --model "EXlatent=${LATB}@0.5" \
  --model "MA=${MA}@1.0" \
  --output-dir results/r5_grid "$@"
