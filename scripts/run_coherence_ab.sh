#!/bin/sh
# Motion-coherence filter ladder (round 4, MAD-scaled semantics of
# commit 1d065b9): threshold = tau + 3*MAD. Can lepard_fine_r4 (best
# tangential matcher, regime-fragile on arms) win/tie BOTH regimes?
# Rows land in results/eval_matrix/ next to the round-4 matrix.
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
FINE="--lepard_weights checkpoints/lepard_fine_r4.npz"
R2="--shape arms --stepwise --frames 12"
run arms_fine_r4_cohm0.01 $R2 $FINE --lepard_coherence 0.01
run arms_fine_r4_cohm0.02 $R2 $FINE --lepard_coherence 0.02
run arms_fine_r4_cohm0.04 $R2 $FINE --lepard_coherence 0.04
R1="--shape limbs --rotate_deg 5 --stepwise --frames 12"
run limbs5_fine_r4_cohm0.01 $R1 $FINE --lepard_coherence 0.01
run limbs5_fine_r4_cohm0.02 $R1 $FINE --lepard_coherence 0.02
run limbs5_fine_r4_cohm0.04 $R1 $FINE --lepard_coherence 0.04
echo "===== coherence ladder done ====="
