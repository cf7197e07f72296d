#!/bin/sh
# Round-5 task 4: headline validation at sequence scale + under stress.
# (a) revisit_gn2 — the 33.3 fps headline's gn_iters=2 lever on the
#     track-loss/recovery regime where warm starts are absent;
# (b) long clips — ATE growth vs frame count at constant per-frame
#     motion (limbs rotate 2 deg/frame) for base vs the round-5
#     recommended config (advect px3 + fine_r4 tau 0.06).
#   nohup sh scripts/run_r5_longclips.sh > logs/r5_longclips.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export XLA_FLAGS="--xla_cpu_parallel_codegen_split_count=1"
OUT=results/eval_matrix
run() {
  name="$1"; shift
  echo "===== $name ====="
  t0=$(date +%s)
  nice -n 10 timeout 5400 python scripts/evaluate_dt4d.py --synthetic \
    --out "$OUT/$name.json" "$@" 2>&1 | tail -2
  echo "[wall $(( $(date +%s) - t0 )) s]"
}
ADV="--flow_weights checkpoints/flow.npz --flow_mode advect --flow_advect_min_px 3.0 \
--lepard_weights checkpoints/lepard_fine_r4.npz --lepard_coherence 0.06 --lepard_coherence_mad 0"
R3="--shape limbs --rotate_deg 3 --frames 18 --camera_path truck_return --camera_amp 0.3"
# (a) revisit under gn2 (recovery enabled to match the r4 rows)
run revisit_gn2 $R3 --keyframe_interval 4 --recovery --gn_iters 2
run revisit_gn2_norecovery $R3 --keyframe_interval 4 --gn_iters 2
# (b) long clips, constant 2 deg/frame tangential motion
L="--shape limbs --rotate_deg 2 --stepwise --gn_iters 2"
run long12_base $L --frames 12
run long48_base $L --frames 48
run long48_advfine $L --frames 48 $ADV
run long96_base $L --frames 96
run long96_advfine $L --frames 96 $ADV
run long192_base $L --frames 192
run long192_advfine $L --frames 192 $ADV
# arms at 48 frames (period-scaled motion; stability evidence)
run arms48_gn2 --shape arms --stepwise --frames 48 --gn_iters 2
run arms48_advfine --shape arms --stepwise --frames 48 --gn_iters 2 $ADV
echo "===== longclips done ====="
