#!/usr/bin/env bash
# Round-5 tail (runs after scripts/r5_pipeline.sh; ONE chip, serialized):
#   1. 500-case suite with the r5 batch-64 self-trained predictor driving
#      the r4 flagship policy (closes the predictor loop end-to-end)
#   2. 20-sample test-mode eval of the r5 predictor vs the reference
#      checkpoint (second standard metric pair)
#   3. Fresh-cache cold-compile report (validates the jitted
#      init_train_state cut, VERDICT r4 item 6)
set -uo pipefail
cd "$(dirname "$0")/.."

RUN=trained_models/GST_predictor_rand_tpu_r4
GST=results/gst_sj_tpu_r5_b64
SWAP=results/r5_policy_b64_gst
mkdir -p "$SWAP" results/logs

echo "[r5-tail] suite with b64 predictor $(date)"
cp "$RUN/config.json" "$SWAP/"
ln -sfn "$(pwd)/$RUN/checkpoints" "$SWAP/checkpoints"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.test \
  --model-dir "$SWAP" --ckpt-step 10000 \
  --gst-model-dir "$GST/epoch_100" \
  > results/logs/r5_test_b64_gst.log 2>&1
grep "Testing success" results/logs/r5_test_b64_gst.log | tail -1

echo "[r5-tail] 20-sample test-mode evals $(date)"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --ckpt "$GST/epoch_100" --data-dir data/sj/test --mode test \
  --max-peds 32 --max-windows 4000 \
  > results/logs/gst_eval_r5_b64_testmode.log 2>&1
tail -1 results/logs/gst_eval_r5_b64_testmode.log
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --torch-ckpt "/root/reference/gst_updated/results/100-gumbel_social_transformer-faster_lstm-lr_0.001-init_temp_0.5-edge_head_0-ebd_64-snl_1-snh_8-seed_1000_rand/sj/checkpoint/epoch_100.pt" \
  --data-dir data/sj/test --mode test --max-peds 32 --max-windows 4000 \
  > results/logs/gst_eval_refckpt_testmode.log 2>&1
tail -1 results/logs/gst_eval_refckpt_testmode.log

echo "[r5-tail] done $(date)"  # compile report already run mid-round (results/logs/compile_report_r5.log)
