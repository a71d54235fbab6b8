#!/bin/sh
# Sequential on-chip breakdown matrix for the warp forward/remat experiments.
# Run EXCLUSIVELY (one TPU process at a time). Appends one JSON line per
# config to benchmarks/breakdown_matrix.jsonl.
set -x
cd "$(dirname "$0")/.."
OUT=benchmarks/breakdown_matrix.jsonl
: > "$OUT"

# 1) new default: matmul forward + matmul adjoint + save_views policy
SINDDM_MM_FORWARD=1 python benchmarks/guided_cost_breakdown.py \
  --mm_adjoint >> "$OUT" 2> /tmp/bd1.log

# 2) same but WITHOUT the save_views remat policy (isolates the policy win)
SINDDM_MM_FORWARD=1 python benchmarks/guided_cost_breakdown.py \
  --mm_adjoint --no_save_views >> "$OUT" 2> /tmp/bd2.log

# 3) gather forward + matmul adjoint + save_views (is the matmul forward
#    actually better than the gather once the refwd is gone?)
SINDDM_MM_FORWARD=0 python benchmarks/guided_cost_breakdown.py \
  --mm_adjoint >> "$OUT" 2> /tmp/bd3.log

echo done
