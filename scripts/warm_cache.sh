#!/usr/bin/env bash
# Warm the persistent XLA compilation cache (.jax_cache) on a fresh
# container so interactive work never pays the multi-minute cold compiles
# (VERDICT r3 #5). One bench iteration compiles the fused flagship train
# program + the edges kernels; a 4-case suite compiles the eval program.
# Prints per-stage wall-clock; run scripts/compile_report.py for the
# per-program cold breakdown.
set -uo pipefail
cd "$(dirname "$0")/.."

t0=$(date +%s)
BENCH_ITERS=1 python bench.py > /tmp/warm_bench.log 2>&1
echo "train program + kernels: $(( $(date +%s) - t0 ))s (see /tmp/warm_bench.log)"

t1=$(date +%s)
if [ -d trained_models/GST_predictor_rand_tpu_r3 ]; then
  python -m crowdnav_prediction_attngraph_tpu.test \
    --model-dir trained_models/GST_predictor_rand_tpu_r3 \
    --ckpt-step 10000 --test-case-size 4 > /tmp/warm_eval.log 2>&1
  echo "eval program: $(( $(date +%s) - t1 ))s"
fi
echo "cache size: $(du -sh .jax_cache 2>/dev/null | cut -f1)"
