#!/usr/bin/env bash
# GST predictor evaluation grid (reference gst_updated/tuning/
# 211203-eval_shuijing.sh + 211209-test_shuijing.sh): for every trained
# run, recompute the validation metrics (checkpoint-consistency check,
# reference eval.py:36-41) and run the 20-sample test-mode inference.
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/sj}
EPOCHS=${EPOCHS:-100}
mkdir -p logs

for seed in 1000; do
  for layers in 1; do
    for lr in 1e-3; do
      for edge_heads in 0; do
        out="results/gst-lr_${lr}-eh_${edge_heads}-snl_${layers}-seed_${seed}"
        ckpt="$out/epoch_${EPOCHS}"
        python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
          --data-dir "$DATA_DIR" --split val --ckpt "$ckpt" \
          --edge-heads "$edge_heads" \
          | tee -a "logs/gst_eval_grid.txt"
        python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
          --data-dir "$DATA_DIR" --split test --mode test --ckpt "$ckpt" \
          --edge-heads "$edge_heads" \
          | tee -a "logs/gst_eval_grid.txt"
      done
    done
  done
done
