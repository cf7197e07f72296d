#!/bin/sh
# VERDICT r2 item 6: through-solver training must WIN (not tie) when
# flow supervision is corrupted the way reconstruction-derived GT is
# (wrong-but-valid at occlusion boundaries + depth holes). Two arms,
# identical data/model/eval, CPU (tracking samples are 64x64):
#   nohup sh scripts/run_solver_ab.sh > logs/solver_ab.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results/eval_matrix
COMMON="--through_solver --corrupt_flow --steps 400 --batch 4 \
--height 64 --width 64 --log_every 50 --save_every 0 --seed 5"

echo "===== arm A: direct supervision (corrupted labels) ====="
TRAIN_CPU=1 nice -n 10 timeout 5400 python scripts/train_flow.py \
  $COMMON --no_solver_terms --out /tmp/ab_direct.npz 2>&1 | tail -4

echo "===== arm B: through-solver + mask losses ====="
TRAIN_CPU=1 nice -n 10 timeout 5400 python scripts/train_flow.py \
  $COMMON --out /tmp/ab_solver.npz 2>&1 | tail -4

echo "===== done (compare final held-out EPE-3D above) ====="
