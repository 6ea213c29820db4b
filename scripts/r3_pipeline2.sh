#!/bin/bash
# Round-3 pipeline, GST stages only (stage 1 — flagship suite — already done).
set -u
cd "$(dirname "$0")/.."
RUN=trained_models/GST_predictor_rand_tpu_r3
GST_OUT=results/gst_sj_tpu_r3
BEST=10000

echo "[pipeline2] launching GST self-training"
timeout 14000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.trainer \
  --data-dir data/sj --out "$GST_OUT" --epochs 100 --temp-epochs 100 \
  --max-windows 24000 --max-val-windows 4000 --rotation-pattern random \
  > gst_train_r3.log 2>&1
echo "[pipeline2] GST train exit=$?; tail:"; tail -2 gst_train_r3.log

echo "[pipeline2] eval self-trained predictor vs reference ckpt (same data+metric)"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --ckpt "$GST_OUT/epoch_100" --data-dir data/sj/test --mode val \
  --max-peds 32 --max-windows 4000 > gst_eval_selftrained.log 2>&1
tail -3 gst_eval_selftrained.log
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --torch-ckpt "/root/reference/gst_updated/results/100-gumbel_social_transformer-faster_lstm-lr_0.001-init_temp_0.5-edge_head_0-ebd_64-snl_1-snh_8-seed_1000_rand/sj/checkpoint/epoch_100.pt" \
  --data-dir data/sj/test --mode val \
  --max-peds 32 --max-windows 4000 > gst_eval_refckpt.log 2>&1
tail -3 gst_eval_refckpt.log

echo "[pipeline2] 500-case suite with the SELF-TRAINED predictor driving the r3 policy"
SWAP=results/r3_policy_selftrained_gst
mkdir -p "$SWAP"
cp "$RUN/config.json" "$SWAP/"
ln -sfn "$(pwd)/$RUN/checkpoints" "$SWAP/checkpoints"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.test \
  --model-dir "$SWAP" --env-name CrowdSimPredRealGST --ckpt-step "$BEST" \
  --gst-model-dir "$GST_OUT/epoch_100" \
  > r3_test_selftrained_gst.log 2>&1
tail -3 "$SWAP"/test/test_0*.log
echo "[pipeline2] all done"
