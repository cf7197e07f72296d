#!/bin/sh
# Corrupted-supervision A/B (VERDICT r4 item 5 / r2 task 6): flow GT is
# wrong-but-valid at occlusions/holes; the through-solver arm sees
# graph/warp losses that can correct it, the direct arm trains on the
# corruption. Same seeds/steps; held-out EPE-3D (clean samples, through
# the solver) is the metric.
set -u
cd "$(dirname "$0")/.."
echo "===== through_solver+corrupt ====="
timeout 2400 python scripts/train_flow.py --through_solver --corrupt_flow \
  --steps 600 --lr 2e-4 --seed 5 \
  --out checkpoints/flow_solver_corrupt.npz 2>&1 | tail -6
echo "===== direct+corrupt (control) ====="
timeout 2400 python scripts/train_flow.py --through_solver --corrupt_flow \
  --no_solver_terms --steps 600 --lr 2e-4 --seed 5 \
  --out checkpoints/flow_direct_corrupt.npz 2>&1 | tail -6
echo "===== done ====="
