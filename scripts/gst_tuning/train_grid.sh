#!/usr/bin/env bash
# GST predictor tuning grid (reference gst_updated/tuning/211130- and
# 211203-train_shuijing.sh): sweep seeds x layers x lr x edge-head modes on
# the self-collected CrowdNav dataset, flagship recipe obs 5 / pred 5,
# temperature annealed over 100 epochs from 0.5, random-rotation
# augmentation, Adam 1e-3 with StepLR(.3 every temp_epochs/4).
#
# Collect the dataset first:
#   python -m crowdnav_prediction_attngraph_tpu.collect_data --out data/sj
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/sj}
EPOCHS=${EPOCHS:-100}
mkdir -p logs results

for seed in 1000; do
  for layers in 1; do            # reference sweeps spatial_num_layers here
    for lr in 1e-3; do
      for edge_heads in 0; do    # 0 = node-head-only edge selector
        out="results/gst-lr_${lr}-eh_${edge_heads}-snl_${layers}-seed_${seed}"
        python -u -m crowdnav_prediction_attngraph_tpu.models.gst.trainer \
          --data-dir "$DATA_DIR" --out "$out" \
          --epochs "$EPOCHS" --temp-epochs "$EPOCHS" --lr "$lr" \
          --edge-heads "$edge_heads" --seed "$seed" \
          --rotation-pattern random --batch-size 16 \
          | tee -a "logs/gst_train_grid.txt"
      done
    done
  done
done
