#!/bin/bash
# Round-3 proof-run pipeline: runs after the flagship PPO train (Pallas-ON
# default path) releases the TPU chip.
#   1. 500-case test suite on the flagship's best-val checkpoint
#   2. GST self-training to epoch 100 on data/sj (fused on-device epochs)
#   3. Reference-mode eval of the self-trained predictor + 500-case suite
#      with it swapped in for the reference epoch_100.pt
# Usage: scripts/r3_pipeline.sh <flagship_pid>
set -u
cd "$(dirname "$0")/.."

FLAGSHIP_PID=${1:-}
RUN=trained_models/GST_predictor_rand_tpu_r3
GST_OUT=results/gst_sj_tpu_r3

if [ -n "$FLAGSHIP_PID" ]; then
  echo "[pipeline] waiting for flagship PID $FLAGSHIP_PID"
  while kill -0 "$FLAGSHIP_PID" 2>/dev/null; do sleep 30; done
fi

BEST=$(python -c "import json;print(json.load(open('$RUN/best.json'))['update'])")
echo "[pipeline] flagship done; best-val update = $BEST"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.test \
  --model-dir "$RUN" --env-name CrowdSimPredRealGST --ckpt-step "$BEST" \
  > r3_test_best.log 2>&1
echo "[pipeline] suite done: $(tail -3 "$RUN"/test/test_0*.log | head -3)"

echo "[pipeline] launching GST self-training"
timeout 14000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.trainer \
  --data-dir data/sj --out "$GST_OUT" --epochs 100 --temp-epochs 100 \
  --max-windows 24000 --max-val-windows 4000 --rotation-pattern random \
  > gst_train_r3.log 2>&1
echo "[pipeline] GST train exit=$?; tail:"; tail -2 gst_train_r3.log

echo "[pipeline] eval self-trained predictor vs reference ckpt (same data+metric)"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --ckpt "$GST_OUT/epoch_100" --data-dir data/sj/test --mode val \
  --max-peds 32 --max-windows 4000 > gst_eval_selftrained.log 2>&1
tail -3 gst_eval_selftrained.log
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --torch-ckpt "/root/reference/gst_updated/results/100-gumbel_social_transformer-faster_lstm-lr_0.001-init_temp_0.5-edge_head_0-ebd_64-snl_1-snh_8-seed_1000_rand/sj/checkpoint/epoch_100.pt" \
  --data-dir data/sj/test --mode val \
  --max-peds 32 --max-windows 4000 > gst_eval_refckpt.log 2>&1
tail -3 gst_eval_refckpt.log

echo "[pipeline] 500-case suite with the SELF-TRAINED predictor driving the r3 policy"
# separate model dir (symlinked checkpoints) so the committed r3 test log
# is not overwritten by this variant run
SWAP=results/r3_policy_selftrained_gst
mkdir -p "$SWAP"
cp "$RUN/config.json" "$SWAP/"
ln -sfn "$(pwd)/$RUN/checkpoints" "$SWAP/checkpoints"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.test \
  --model-dir "$SWAP" --env-name CrowdSimPredRealGST --ckpt-step "$BEST" \
  --gst-model-dir "$GST_OUT/epoch_100" \
  > r3_test_selftrained_gst.log 2>&1
tail -3 "$SWAP"/test/test_0*.log
echo "[pipeline] all done"
