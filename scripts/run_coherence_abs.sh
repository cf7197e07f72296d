#!/bin/sh
# Absolute-threshold (mad=0) coherence rows: the MAD allowance protects
# contested bridge CLUSTERS on arms (cohm0.01 measured 47.4 mm ATE vs
# the pure-absolute pilot's 27.8); this ladder pins the absolute
# variant on both regimes with clean provenance.
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
run arms_fine_r4_abs0.03 $R2 $FINE --lepard_coherence 0.03
run arms_fine_r4_abs0.06 $R2 $FINE --lepard_coherence 0.06
R1="--shape limbs --rotate_deg 5 --stepwise --frames 12"
run limbs5_fine_r4_abs0.06 $R1 $FINE --lepard_coherence 0.06
run limbs5_fine_r4_abs0.10 $R1 $FINE --lepard_coherence 0.10
echo "===== absolute ladder done ====="
