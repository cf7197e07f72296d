#!/bin/sh
# Round-4 tail probes: re-pin the arms tau-0.12 sidecar (deleted with
# the ambiguous batch), the tau-0.05 compromise pair, and the
# feature-recovery trace (print_infos -> does the seed fire?).
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
run arms_fine_r4_abs0.12 $R2 $FINE --lepard_coherence 0.12
run arms_fine_r4_abs0.05 $R2 $FINE --lepard_coherence 0.05
run limbs5_fine_r4_abs0.05 $R1 $FINE --lepard_coherence 0.05
R3="--shape limbs --rotate_deg 3 --frames 18 --camera_path truck_return --camera_amp 0.3"
echo "===== revisit_feat_trace ====="
nice -n 15 timeout 1800 python scripts/evaluate_dt4d.py --synthetic \
  $R3 --keyframe_interval 4 \
  --lepard_weights checkpoints/lepard_fine_r4.npz --lepard_reloc_only \
  --lepard_coherence 0.03 --lepard_coherence_mad 0 --print_infos \
  --out $OUT/revisit_feat_fine.json 2>&1 | grep -E "reloc_feat|pose_correction|track_lost|loop_clos|ate_m" | tail -30
echo "===== tail done ====="
