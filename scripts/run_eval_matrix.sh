#!/bin/sh
# The official synthetic parity matrix (BASELINE.md real-data boundary):
# component-delta A/Bs on the hard-synthetic clips, CPU, all metrics to
# JSON sidecars under results/eval_matrix/. Tabulated in
# docs/EVAL_MATRIX.md.
#
#   nohup sh scripts/run_eval_matrix.sh > logs/eval_matrix.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=results/eval_matrix
mkdir -p "$OUT"

run() {
  name="$1"; shift
  echo "===== $name ====="
  t0=$(date +%s)
  nice -n 10 timeout 1800 python scripts/evaluate_dt4d.py --synthetic \
    --out "$OUT/$name.json" "$@" 2>&1 | tail -2
  echo "[wall $(( $(date +%s) - t0 )) s]"
}

# --- regime 1: tangential motion (limbs, 5 deg/frame in-plane) -------
R1="--shape limbs --rotate_deg 5 --stepwise --frames 12"
run limbs5_base $R1
run limbs5_lepard_trained $R1 --lepard_weights checkpoints/lepard_trained.npz
run limbs5_lepard_r2 $R1 --lepard_weights checkpoints/lepard_r2.npz
run limbs5_lepard_r2_every2 $R1 --lepard_weights checkpoints/lepard_r2.npz \
  --lepard_every 2
run limbs5_lepard_r2_every4 $R1 --lepard_weights checkpoints/lepard_r2.npz \
  --lepard_every 4
run limbs5_lepard_r2_strided $R1 \
  --lepard_weights checkpoints/lepard_r2.npz --lepard_subsample strided

# --- regime 2: articulated self-occlusion (arms) ---------------------
R2="--shape arms --stepwise --frames 12"
run arms_base $R2
run arms_flow_fill $R2 --flow_weights checkpoints/flow.npz
run arms_flow_override $R2 --flow_weights checkpoints/flow.npz \
  --flow_mode override
run arms_lepard_r2 $R2 --lepard_weights checkpoints/lepard_r2.npz

run arms_flow_ds2 $R2 --flow_weights checkpoints/flow.npz \
  --flow_downscale 2

# --- solver A/B ------------------------------------------------------
run limbs5_nicp $R1 --solver nicp
run limbs5_motion_gnn $R1 --use_motion_model
# iteration-count ladder (warm-started tracking solve; the envelope
# perf ladder wants the smallest iters that holds accuracy)
run limbs5_gn2 $R1 --gn_iters 2
run limbs5_gn3 $R1 --gn_iters 3
run arms_gn2 $R2 --gn_iters 2
run arms_gn3 $R2 --gn_iters 3

# --- pose graph: leave-and-revisit camera ----------------------------
R3="--shape limbs --rotate_deg 3 --frames 18 --camera_path truck_return --camera_amp 0.3"
run revisit_base $R3 --stepwise
run revisit_posegraph $R3 --keyframe_interval 4

echo "===== matrix done ====="
