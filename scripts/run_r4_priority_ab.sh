#!/bin/sh
# Round-4 closing A/B queue, priority order:
#   1. absolute-coherence rows (regime-fragility conclusion)
#   2. regime-3 feature-recovery A/B
#   3. flow-override-vs-fill with the corrupted-supervision checkpoint
set -u
cd "$(dirname "$0")/.."
OUT=results/eval_matrix
run() {
  name="$1"; shift
  echo "===== $name ====="
  t0=$(date +%s)
  nice -n 15 timeout 1800 python scripts/evaluate_dt4d.py --synthetic \
    --out "$OUT/$name.json" "$@" 2>&1 | tail -2
  echo "[wall $(( $(date +%s) - t0 )) s]"
}
FINE="--lepard_weights checkpoints/lepard_fine_r4.npz --lepard_coherence_mad 0"
R2="--shape arms --stepwise --frames 12"
R1="--shape limbs --rotate_deg 5 --stepwise --frames 12"
run arms_fine_r4_abs0.03 $R2 $FINE --lepard_coherence 0.03
run limbs5_fine_r4_abs0.06 $R1 $FINE --lepard_coherence 0.06
run arms_fine_r4_abs0.06 $R2 $FINE --lepard_coherence 0.06
run limbs5_fine_r4_abs0.10 $R1 $FINE --lepard_coherence 0.10

R3="--shape limbs --rotate_deg 3 --frames 18 --camera_path truck_return --camera_amp 0.3"
run revisit_feat_fine $R3 --keyframe_interval 4 \
  --lepard_weights checkpoints/lepard_fine_r4.npz --lepard_reloc_only \
  --lepard_coherence 0.03 --lepard_coherence_mad 0
run revisit_feat_r2 $R3 --keyframe_interval 4 \
  --lepard_weights checkpoints/lepard_r2.npz --lepard_reloc_only \
  --lepard_coherence 0.03 --lepard_coherence_mad 0

run arms_flowsc_fill $R2 --flow_weights checkpoints/flow_solver_corrupt.npz
run arms_flowsc_override $R2 --flow_weights checkpoints/flow_solver_corrupt.npz \
  --flow_mode override
echo "===== priority queue done ====="
