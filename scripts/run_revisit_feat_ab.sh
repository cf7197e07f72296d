#!/bin/sh
# Regime-3 feature-based recovery A/B (round 4): does a Lepard Kabsch
# pose as the track-loss recovery seed fix the surface-identity caveat
# (final-frame EPE 278 vs 110 mm) that geometric centroid-init ICP
# cannot? Matcher is loaded RELOC-ONLY so the per-frame loop is
# identical to the revisit_posegraph row.
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
R3="--shape limbs --rotate_deg 3 --frames 18 --camera_path truck_return --camera_amp 0.3"
run revisit_feat_fine $R3 --keyframe_interval 4 \
  --lepard_weights checkpoints/lepard_fine_r4.npz --lepard_reloc_only \
  --lepard_coherence 0.03
run revisit_feat_r2 $R3 --keyframe_interval 4 \
  --lepard_weights checkpoints/lepard_r2.npz --lepard_reloc_only \
  --lepard_coherence 0.03
echo "===== revisit feat A/B done ====="
