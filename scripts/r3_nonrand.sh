#!/bin/bash
# Stretch (VERDICT r2 item 8): the reference's second shipped regime —
# GST_predictor_non_rand (env.randomize_attributes=False, GST checkpoint
# trained on non-randomized data: gst_updated/results/...seed_1000/sj).
# Reference headline: trained_models/GST_predictor_non_rand/test/
# test_41200.pt.log success 0.92. Waits for the r3 pipeline to free the chip.
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
RUN=trained_models/GST_predictor_non_rand_tpu_r3
GST_DIR="/root/reference/gst_updated/results/100-gumbel_social_transformer-faster_lstm-lr_0.001-init_temp_0.5-edge_head_0-ebd_64-snl_1-snh_8-seed_1000/sj"

if [ -n "$WAIT_PID" ]; then
  echo "[nonrand] waiting for PID $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "[nonrand] launching training"
timeout 9000 python -u -m crowdnav_prediction_attngraph_tpu.train \
  --output-dir "$RUN" --num-processes 64 --use-linear-lr-decay \
  --eval-interval 250 --eval-size 500 --no-randomize-attributes \
  --gst-model-dir "$GST_DIR" > train_nonrand_r3.log 2>&1
echo "[nonrand] train exit=$?"

BEST=$(python -c "import json;print(json.load(open('$RUN/best.json'))['update'])")
echo "[nonrand] best-val update = $BEST"
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.test \
  --model-dir "$RUN" --env-name CrowdSimPredRealGST --ckpt-step "$BEST" \
  --no-randomize-attributes --gst-model-dir "$GST_DIR" \
  > nonrand_test_best.log 2>&1
tail -3 "$RUN"/test/test_0*.log
echo "[nonrand] done"
