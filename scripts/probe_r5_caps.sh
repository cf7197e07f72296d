#!/bin/sh
# Round-5 cap-512 stage decomposition + one cap-1024 measurement
# (VERDICT r4 task 6). Reference envelope (128^3 @ 5mm, 448x640,
# bricked), accuracy-validated opt levers (sparse lift + bf16 + mask/2
# + strided subsample + gn2), stages toggled one at a time, each in a
# FRESH process (relay overhead grows in-process).
#   nohup sh scripts/probe_r5_caps.sh > logs/probe_r5_caps.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
ENV_COMMON="BENCH_MODE=fusion_chunked BENCH_VOL=128 BENCH_VOXEL_SIZE=0.005 \
BENCH_IMG=448x640 BENCH_MAX_POINTS=8192 BENCH_BRICK=8 \
BENCH_MAX_BRICKS=1024 BENCH_NODE_COVERAGE=0.05 BENCH_BUDGET_S=2400 \
BENCH_GN_ITERS=2 BENCH_FLOW_LIFT=sparse BENCH_FLOW_BF16=1 \
BENCH_MASK_DS=2 BENCH_LEPARD_SUBSAMPLE=strided"
run_cfg() {
  name="$1"; shift
  echo "===== $name ====="
  echo "extra: $*"
  t0=$(date +%s)
  env $ENV_COMMON "$@" timeout 2500 python bench.py 2>&1 | tail -2
  echo "[wall $(( $(date +%s) - t0 )) s]"
}
C5="BENCH_MAX_NODES=512"
run_cfg c512_base $C5
run_cfg c512_gnn $C5 BENCH_MOTION=1
run_cfg c512_lepard $C5 BENCH_LEPARD=1
run_cfg c512_flow $C5 BENCH_FLOW=1
run_cfg c512_full $C5 BENCH_MOTION=1 BENCH_FLOW=1 BENCH_LEPARD=1
run_cfg c1024_full BENCH_MAX_NODES=1024 BENCH_MOTION=1 BENCH_FLOW=1 \
  BENCH_LEPARD=1 BENCH_DENSE_SKIN_MAX=4294967296
echo "===== caps done ====="
