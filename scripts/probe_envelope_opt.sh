#!/bin/sh
# Round-3 optimization probes at the reference envelope (cap 256), one
# fresh process each, informed by the stage decomposition
# (base 28.3 ms / GNN +1.6 / flow +34 / lepard +119):
#   nohup sh scripts/probe_envelope_opt.sh > logs/probe_opt.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
ENV_COMMON="BENCH_MODE=fusion_chunked BENCH_VOL=128 BENCH_VOXEL_SIZE=0.005 \
BENCH_IMG=448x640 BENCH_MAX_NODES=256 BENCH_MAX_POINTS=8192 BENCH_BRICK=8 \
BENCH_MAX_BRICKS=1024 BENCH_NODE_COVERAGE=0.05 BENCH_BUDGET_S=3000"

run_cfg() {
  name="$1"; shift
  echo "===== $name ====="
  echo "extra: $*"
  t0=$(date +%s)
  env $ENV_COMMON "$@" timeout 3100 python bench.py 2>&1 | tail -3
  echo "[wall $(( $(date +%s) - t0 )) s]"
}

# lepard ladder (dominant stage: 119 ms/frame)
run_cfg lepard_strided BENCH_LEPARD=1 BENCH_LEPARD_SUBSAMPLE=strided
run_cfg lepard_strided_batched BENCH_LEPARD=1 \
  BENCH_LEPARD_SUBSAMPLE=strided BENCH_LEPARD_BATCHED=1
run_cfg lepard_strided_batched_every4 BENCH_LEPARD=1 \
  BENCH_LEPARD_SUBSAMPLE=strided BENCH_LEPARD_BATCHED=1 \
  BENCH_LEPARD_EVERY=4
# flow ladder (34 ms/frame)
run_cfg flow_sparse_bf16_mds2 BENCH_FLOW=1 BENCH_FLOW_LIFT=sparse \
  BENCH_FLOW_BF16=1 BENCH_MASK_DS=2
run_cfg flow_sparse_bf16_mds2_ds2 BENCH_FLOW=1 BENCH_FLOW_LIFT=sparse \
  BENCH_FLOW_BF16=1 BENCH_MASK_DS=2 BENCH_FLOW_DS=2
# the full optimized loop
run_cfg full_opt BENCH_MOTION=1 BENCH_FLOW=1 BENCH_LEPARD=1 \
  BENCH_FLOW_LIFT=sparse BENCH_FLOW_BF16=1 BENCH_MASK_DS=2 \
  BENCH_LEPARD_SUBSAMPLE=strided BENCH_LEPARD_BATCHED=1 \
  BENCH_LEPARD_EVERY=4
echo "===== done ====="
