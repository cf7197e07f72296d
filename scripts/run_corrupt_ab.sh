#!/bin/sh
# Corrupted-supervision A/B (VERDICT r4 item 5 / r2 task 6): flow GT is
# wrong-but-valid at occlusions/holes; the through-solver arm sees
# graph/warp losses that can correct it, the direct arm trains on the
# corruption. Same seeds/steps; held-out EPE-3D (clean samples, through
# the solver) is the metric. 250 steps: the solver-only pilot
# (logs/train_solver_only.log) plateaus by step 200.
set -u
cd "$(dirname "$0")/.."
echo "===== through_solver+corrupt ====="
TRAIN_CPU=1 timeout 2900 python scripts/train_flow.py --through_solver --corrupt_flow \
  --steps 250 --lr 2e-4 --seed 5 --log_every 25 \
  --out checkpoints/flow_solver_corrupt.npz 2>&1 | tail -14
echo "===== direct+corrupt (control) ====="
TRAIN_CPU=1 timeout 2900 python scripts/train_flow.py --through_solver --corrupt_flow \
  --no_solver_terms --steps 250 --lr 2e-4 --seed 5 --log_every 25 \
  --out checkpoints/flow_direct_corrupt.npz 2>&1 | tail -14
echo "===== done ====="
